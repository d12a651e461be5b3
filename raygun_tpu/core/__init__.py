from .roi import Coordinate, Roi, block_grid
from .config import read_config, eval_args, eval_expr, merge_dicts, strip_json_comments
from .utils import (
    passing_locals, get_config_name, calc_max_padding, serialize, to_json,
    load_json_file,
)
