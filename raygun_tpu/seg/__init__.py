from .segment import (
    FragmentPipeline, watershed_from_affinities,
    get_segmentation, mutex_segment, segment,
)
from ..native import mutex_watershed, seeded_watershed, rand_voi, connected_components
from .mws_device import mutex_watershed_device
