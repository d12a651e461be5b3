from .volume import Volume, open_ds, prepare_ds
from .synthetic import (
    make_segmentation_dataset, make_cyclegan_dataset, make_skeleton_nml,
    synthetic_labels,
    synthetic_raw_from_labels,
)
from .targets import (
    add_affinities, balance_labels, grow_boundary, local_shape_descriptors,
    lsd_mask, mtlsd_neighborhood, diagonal_neighborhood,
)
from .augment import (
    normalize, intensity_scale_shift, intensity_augment, noise_augment,
    simple_augment, elastic_augment, elastic_margin, elastic_coordinates, warp,
    elastic_params, warp_shears,
)
from .sampler import DeviceVolumeSampler, MultiSourceSampler, HostStreamSampler, valid_origins
