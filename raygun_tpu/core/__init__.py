from .roi import Coordinate, Roi, block_grid
from .config import read_config, eval_args, eval_expr, merge_dicts, to_json, strip_json_comments
