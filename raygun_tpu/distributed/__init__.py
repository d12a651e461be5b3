from .mesh import make_mesh, spec
from .blockwise import (
    BlockwiseRunner, SuperBlockRunner, halo_exchange_1d, make_sharded_infer_1d,
    halo_exchange, make_sharded_infer, sharded_infer_volume,
)
from .queue import FileClaimQueue
