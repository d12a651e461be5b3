from .image_metrics import (
    normalized_root_mse, peak_signal_noise_ratio, structural_similarity,
    image_compare, images_compare,
)
from .skeleton import line_nd, parse_nml, parse_skeleton_archive, rasterize_skeleton
from .validate import (
    run_validation, validate_affinities, validate_segmentation,
    update_validation_configs, pad_eval, get_score, find_source_path,
)
from .inspect_logs import (
    read_json_log, read_tensorboard_log, smooth, composite_score,
    score_log, pick_best, inspect_logs,
)
from ..native import rand_voi
from .figures import batch_show, label2rgb, qualitative_figs
from .inspect_tests import (
    collect_metric_distributions, significance_matrices, inspect_tests,
)
from .render_best import render_best
