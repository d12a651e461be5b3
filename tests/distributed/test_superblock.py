"""SuperBlockRunner: teravoxel-tier mesh-sharded inference (VERDICT r2 #2).

Streams super-blocks through the N-D sharded program — mesh-parallel
compute with bounded host memory. Output must be voxel-equal to the
single-pass computation and to BlockwiseRunner (seam-freeness through BOTH
the super-block grid and the intra-block mesh shards)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from raygun_tpu.core import Coordinate, Roi
from raygun_tpu.distributed import BlockwiseRunner, SuperBlockRunner
from raygun_tpu.io import open_ds, prepare_ds
from raygun_tpu.nn import ConvPass


class TinyValidNet(nn.Module):
    """Two valid 3^3 convs: consumes 4 voxels per axis (context 2)."""

    features: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        return ConvPass(
            output_nc=self.features, kernel_sizes=[(3, 3, 3), (3, 3, 3)],
            activation="tanh", padding="valid",
        )(x, train=train)


@pytest.fixture(scope="module")
def net_and_params():
    net = TinyValidNet()
    x = jnp.zeros((1, 12, 12, 12, 1))
    variables = net.init(jax.random.PRNGKey(7), x)
    return net, variables["params"]


def _make_volume(tmp_path, vol_shape, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.random(vol_shape).astype(np.float32)
    vx = Coordinate(4, 4, 4)
    total = Roi((0, 0, 0), Coordinate(vol_shape) * vx)
    path = str(tmp_path / "in.zarr")
    src = prepare_ds(path, "raw", total, vx, np.float32, delete=True)
    src.write(total, data)
    return path, data, vx, total


def test_superblock_matches_single_pass(tmp_path, net_and_params):
    """2x2x2 mesh, super-blocks smaller than the volume, non-divisible
    extents: output voxel-equal to one full pass."""
    net, params = net_and_params
    vol_shape = (36, 26, 30)
    path, data, vx, total = _make_volume(tmp_path, vol_shape)

    ctx = Coordinate(8, 8, 8)  # 2 voxels * vx
    write_roi = total.grow(-ctx, -ctx)
    dest = prepare_ds(path, "out", write_roi, vx, np.float32,
                      num_channels=3, delete=True)

    def fn(x):
        return {"out": net.apply({"params": params}, x[None])[0]}

    runner = SuperBlockRunner(
        source=open_ds(path, "raw"),
        outputs={"out": dest},
        fn=fn,
        input_shape=(12, 12, 12),
        output_shape=(8, 8, 8),
        mesh_shape=(2, 2, 2),
        super_block_shape=(16, 16, 16),
    )
    # the super-block grid actually tiles: >1 block, and each read is a
    # bounded fraction of the volume (the memory contract)
    assert len(runner.blocks) > 1
    read_vox = int(np.prod(runner.padded_shape))
    assert read_vox < int(np.prod(vol_shape))
    stats = runner.run()
    assert stats["blocks"] == len(runner.blocks)

    sharded = open_ds(path, "out").read()
    full = net.apply({"params": params}, jnp.asarray(data)[None, ..., None])
    full = np.moveaxis(np.asarray(full[0]), -1, 0)
    assert sharded.shape == full.shape
    np.testing.assert_allclose(sharded, full, rtol=0, atol=1e-5)


def test_superblock_matches_blockwise_runner(tmp_path, net_and_params):
    """Voxel-equality with the per-chip BlockwiseRunner (the VERDICT 'Done'
    criterion), on an 8x1x1 mesh."""
    net, params = net_and_params
    vol_shape = (44, 20, 20)
    path, data, vx, total = _make_volume(tmp_path, vol_shape, seed=3)
    ctx = Coordinate(8, 8, 8)
    write_roi = total.grow(-ctx, -ctx)

    dest_sb = prepare_ds(path, "out_sb", write_roi, vx, np.float32,
                         num_channels=3, delete=True)
    dest_bw = prepare_ds(path, "out_bw", write_roi, vx, np.float32,
                         num_channels=3, delete=True)

    def fn(x):
        return {"out_sb": net.apply({"params": params}, x[None])[0]}

    SuperBlockRunner(
        source=open_ds(path, "raw"), outputs={"out_sb": dest_sb}, fn=fn,
        input_shape=(12, 12, 12), output_shape=(8, 8, 8),
        mesh_shape=(8, 1, 1), super_block_shape=(24, 12, 12),
    ).run()

    fwd = jax.jit(lambda x: {"out_bw": net.apply({"params": params}, x)})
    BlockwiseRunner(
        source=open_ds(path, "raw"), outputs={"out_bw": dest_bw}, fn=fwd,
        input_shape=(12, 12, 12), output_shape=(8, 8, 8),
    ).run()

    np.testing.assert_array_equal(
        open_ds(path, "out_sb").read(), open_ds(path, "out_bw").read()
    )


def test_superblock_rejects_undersized_shards():
    """Shard extent below the halo must raise, not silently corrupt."""
    import raygun_tpu.distributed.blockwise as bw

    class FakeVol:
        voxel_size = Coordinate(1, 1, 1)
        roi = Roi((0, 0, 0), (100, 100, 100))

    with pytest.raises(ValueError, match="super_block too small"):
        bw.SuperBlockRunner(
            source=FakeVol(), outputs={}, fn=lambda x: {},
            input_shape=(20, 20, 20), output_shape=(4, 4, 4),
            mesh_shape=(8, 1, 1), super_block_shape=(8, 8, 8),
        )
