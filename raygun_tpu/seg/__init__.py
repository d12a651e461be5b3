from .segment import (
    watershed_from_affinities, watershed_from_boundary_distance,
    get_segmentation, mutex_segment, segment,
)
from ..native import mutex_watershed, seeded_watershed, rand_voi, connected_components
