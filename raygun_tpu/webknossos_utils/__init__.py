from .wk import (
    wkw_seg_to_zarr, get_wk_mask, make_cutout, upload_raw_to_webknossos,
    mask_seg, download_wk_skeleton, parse_wkw_header,
)
