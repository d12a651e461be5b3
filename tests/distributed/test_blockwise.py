"""Blockwise inference correctness: seam-freeness (blockwise == single pass)
and ICI halo exchange on the 8-device CPU mesh (SURVEY §5.7 north star)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from raygun_tpu.core import Coordinate, Roi
from raygun_tpu.distributed import (
    BlockwiseRunner,
    halo_exchange_1d,
    make_mesh,
    make_sharded_infer_1d,
)
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


def test_blockwise_matches_single_pass(tmp_path, net_and_params):
    net, params = net_and_params
    rng = np.random.default_rng(0)
    vol_shape = (28, 28, 28)
    data = rng.random(vol_shape).astype(np.float32)
    vx = Coordinate(10, 10, 10)
    total = Roi((0, 0, 0), Coordinate(vol_shape) * vx)

    path = str(tmp_path / "in.zarr")
    src = prepare_ds(path, "raw", total, vx, np.float32, delete=True)
    src.write(total, data)

    input_shape, output_shape = (12, 12, 12), (8, 8, 8)
    context = 2
    write_roi = total.grow(Coordinate(-20, -20, -20), Coordinate(-20, -20, -20))
    dest = prepare_ds(path, "out", write_roi, vx, np.float32, num_channels=3, delete=True)

    fwd = jax.jit(lambda x: {"out": net.apply({"params": params}, x)})
    runner = BlockwiseRunner(
        source=open_ds(path, "raw"),
        outputs={"out": dest},
        fn=fwd,
        input_shape=input_shape,
        output_shape=output_shape,
    )
    stats = runner.run()
    assert stats["blocks"] == 27  # 24/8 = 3 per dim

    blockwise = open_ds(path, "out").read()
    # single full pass over the grown read region
    full = net.apply({"params": params}, jnp.asarray(data)[None, ..., None])
    full = np.moveaxis(np.asarray(full[0]), -1, 0)  # (3, 24, 24, 24)
    assert blockwise.shape == full.shape
    np.testing.assert_allclose(blockwise, full, rtol=0, atol=1e-5)


def test_blockwise_boundary_clipping(tmp_path, net_and_params):
    """Non-divisible volumes: boundary blocks write clipped ROIs."""
    net, params = net_and_params
    rng = np.random.default_rng(1)
    vol_shape = (24, 24, 24)  # writable 20^3, blocks of 8 -> 8+8+4 per dim
    data = rng.random(vol_shape).astype(np.float32)
    vx = Coordinate(10, 10, 10)
    total = Roi((0, 0, 0), Coordinate(vol_shape) * vx)
    path = str(tmp_path / "in2.zarr")
    src = prepare_ds(path, "raw", total, vx, np.float32, delete=True)
    src.write(total, data)
    write_roi = total.grow(Coordinate(-20, -20, -20), Coordinate(-20, -20, -20))
    dest = prepare_ds(path, "out", write_roi, vx, np.float32, num_channels=3, delete=True)

    fwd = jax.jit(lambda x: {"out": net.apply({"params": params}, x)})
    runner = BlockwiseRunner(
        source=open_ds(path, "raw"), outputs={"out": dest}, fn=fwd,
        input_shape=(12, 12, 12), output_shape=(8, 8, 8), device_batch=4,
    )
    stats = runner.run()
    assert stats["blocks"] == 27
    blockwise = open_ds(path, "out").read()
    full = net.apply({"params": params}, jnp.asarray(data)[None, ..., None])
    full = np.moveaxis(np.asarray(full[0]), -1, 0)
    np.testing.assert_allclose(blockwise, full, rtol=0, atol=1e-5)


class TestHaloExchange:
    def test_halo_matches_reflect_pad(self):
        """sharded shard+halo concat == reflect-padded full volume slabs."""
        n = 8
        mesh = make_mesh((n,), ("block",))
        Z = 32
        x = jnp.asarray(np.random.default_rng(2).random((Z, 4, 4)).astype(np.float32))
        h = 2

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        gathered = shard_map(
            lambda s: halo_exchange_1d(s, h, "block", axis=0),
            mesh=mesh, in_specs=(P("block"),), out_specs=P("block"),
            check_vma=False,
        )(x)
        # per-shard size with halo: Z/n + 2h; global concat: Z + n*2h
        assert gathered.shape == (Z + n * 2 * h, 4, 4)
        ref_pad = jnp.concatenate([jnp.flip(x[:h], 0), x, jnp.flip(x[-h:], 0)], 0)
        shard = Z // n
        for i in range(n):
            got = np.asarray(gathered[i * (shard + 2 * h):(i + 1) * (shard + 2 * h)])
            want = np.asarray(ref_pad[i * shard:i * shard + shard + 2 * h])
            np.testing.assert_array_equal(got, want)

    def test_sharded_infer_seam_free(self, net_and_params):
        """Whole-volume sharded inference == single-device computation."""
        net, params = net_and_params
        n = 8
        mesh = make_mesh((n,), ("block",))
        Z, Y, X = 32, 12, 12
        x = jnp.asarray(
            np.random.default_rng(3).random((Z, Y, X, 1)).astype(np.float32)
        )

        def model_fn(v):
            # valid conv consumes 4 per axis; reflect-pad y/x so only z shrinks
            v = jnp.pad(v, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
            return net.apply({"params": params}, v[None])[0]

        infer = make_sharded_infer_1d(model_fn, mesh, halo=2, spatial_axis=0)
        out = infer(x)
        assert out.shape == (Z, Y, X, 3)

        # reference: same computation single-device with reflect-padded z
        xp = jnp.concatenate([jnp.flip(x[:2], 0), x, jnp.flip(x[-2:], 0)], 0)
        ref = model_fn(xp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_sharded_infer_edge_valid(self, net_and_params):
        """edge='valid' returns ONLY real-context voxels: exact equality
        (including the outermost rows) with the unpadded single-device
        valid computation — no reflected context anywhere."""
        net, params = net_and_params
        n = 8
        mesh = make_mesh((n,), ("block",))
        Z, Y, X = 32, 12, 12
        x = jnp.asarray(
            np.random.default_rng(5).random((Z, Y, X, 1)).astype(np.float32)
        )

        def model_fn(v):
            v = jnp.pad(v, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
            return net.apply({"params": params}, v[None])[0]

        infer = make_sharded_infer_1d(
            model_fn, mesh, halo=2, spatial_axis=0, edge="valid")
        out = infer(x)
        assert out.shape == (Z - 4, Y, X, 3)
        ref = model_fn(x)  # valid on z: (Z-4, Y, X, 3), real context only
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

        with pytest.raises(ValueError, match="edge"):
            make_sharded_infer_1d(model_fn, mesh, halo=2, edge="wrap")

    def test_sharded_infer_nd_edge_valid(self, net_and_params):
        """N-D edge='valid': exchanged axes crop, size-1 mesh axes don't."""
        from raygun_tpu.distributed.blockwise import make_sharded_infer

        net, params = net_and_params
        import jax as _jax

        mesh = make_mesh((4, 1), ("bz", "by"),
                         devices=_jax.devices()[:4])
        Z, Y, X = 16, 12, 12
        x = jnp.asarray(
            np.random.default_rng(6).random((Z, Y, X, 1)).astype(np.float32)
        )

        def model_fn(v):
            # valid on z only; y/x reflect-padded inside
            v = jnp.pad(v, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
            return net.apply({"params": params}, v[None])[0]

        infer = make_sharded_infer(
            model_fn, mesh, halos=(2, 0), spatial_axes=(0, 1), edge="valid")
        out = infer(x)
        assert out.shape == (Z - 4, Y, X, 3)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(model_fn(x)), atol=1e-5)


class TestShardedInferVolume:
    """N-D mesh-sharded whole-volume inference (CLI 'sharded' path) is
    seam-equivalent to the blockwise runner / a single full pass."""

    def test_matches_single_pass_2x2x2(self, tmp_path, net_and_params):
        net, params = net_and_params
        from raygun_tpu.distributed.blockwise import sharded_infer_volume

        rng = np.random.default_rng(1)
        vol_shape = (22, 26, 30)  # non-divisible extents exercise padding
        data = rng.random(vol_shape).astype(np.float32)
        vx = Coordinate(4, 4, 4)
        total = Roi((0, 0, 0), Coordinate(vol_shape) * vx)
        path = str(tmp_path / "in.zarr")
        src = prepare_ds(path, "raw", total, vx, np.float32, delete=True)
        src.write(total, data)

        ctx = Coordinate(8, 8, 8)  # 2 voxels * vx
        write_roi = total.grow(-ctx, -ctx)
        dest = prepare_ds(path, "out", write_roi, vx, np.float32,
                          num_channels=3, delete=True)

        def fn(x):
            return {"out": net.apply({"params": params}, x[None])[0]}

        stats = sharded_infer_volume(
            source=open_ds(path, "raw"),
            outputs={"out": dest},
            fn=fn,
            input_shape=(12, 12, 12),
            output_shape=(8, 8, 8),
            mesh_shape=(2, 2, 2),
        )
        assert stats["blocks"] == 1

        sharded = open_ds(path, "out").read()
        full = net.apply({"params": params}, jnp.asarray(data)[None, ..., None])
        full = np.moveaxis(np.asarray(full[0]), -1, 0)
        assert sharded.shape == full.shape
        np.testing.assert_allclose(sharded, full, rtol=0, atol=1e-5)

    def test_single_axis_mesh(self, tmp_path, net_and_params):
        net, params = net_and_params
        from raygun_tpu.distributed.blockwise import sharded_infer_volume

        rng = np.random.default_rng(2)
        vol_shape = (36, 14, 14)
        data = rng.random(vol_shape).astype(np.float32)
        vx = Coordinate(1, 1, 1)
        total = Roi((0, 0, 0), Coordinate(vol_shape))
        path = str(tmp_path / "in.zarr")
        src = prepare_ds(path, "raw", total, vx, np.float32, delete=True)
        src.write(total, data)
        write_roi = total.grow(Coordinate(-2, -2, -2), Coordinate(-2, -2, -2))
        dest = prepare_ds(path, "out", write_roi, vx, np.float32,
                          num_channels=3, delete=True)

        def fn(x):
            return {"out": net.apply({"params": params}, x[None])[0]}

        sharded_infer_volume(
            source=open_ds(path, "raw"), outputs={"out": dest}, fn=fn,
            input_shape=(12, 12, 12), output_shape=(8, 8, 8),
            mesh_shape=(8, 1, 1),
        )
        sharded = open_ds(path, "out").read()
        full = net.apply({"params": params}, jnp.asarray(data)[None, ..., None])
        full = np.moveaxis(np.asarray(full[0]), -1, 0)
        np.testing.assert_allclose(sharded, full, rtol=0, atol=1e-5)


class TestFileClaimQueue:
    """Shared-filesystem lease queue (daisy control-plane replacement):
    disjoint claims across workers, durable completion, stale-lease
    reissue."""

    def test_two_runners_share_all_blocks(self, tmp_path, net_and_params):
        net, params = net_and_params
        rng = np.random.default_rng(5)
        vol_shape = (28, 28, 28)
        data = rng.random(vol_shape).astype(np.float32)
        vx = Coordinate(10, 10, 10)
        total = Roi((0, 0, 0), Coordinate(vol_shape) * vx)
        path = str(tmp_path / "in.zarr")
        src = prepare_ds(path, "raw", total, vx, np.float32, delete=True)
        src.write(total, data)
        write_roi = total.grow(Coordinate(-20, -20, -20), Coordinate(-20, -20, -20))
        dest = prepare_ds(path, "out", write_roi, vx, np.float32,
                          num_channels=3, delete=True)
        fwd = jax.jit(lambda x: {"out": net.apply({"params": params}, x)})
        qdir = str(tmp_path / "queue")

        def make_runner():
            return BlockwiseRunner(
                source=open_ds(path, "raw"), outputs={"out": dest}, fn=fwd,
                input_shape=(12, 12, 12), output_shape=(8, 8, 8),
                queue_dir=qdir,
            )

        r1, r2 = make_runner(), make_runner()
        s1 = r1.run()
        s2 = r2.run()  # everything already claimed+done
        assert s1["blocks"] == 27 and s2["blocks"] == 0
        assert r1.queue.remaining() == 0

        out = open_ds(path, "out").read()
        full = net.apply({"params": params}, jnp.asarray(data)[None, ..., None])
        full = np.moveaxis(np.asarray(full[0]), -1, 0)
        np.testing.assert_allclose(out, full, rtol=0, atol=1e-5)

    def test_stale_lease_reissued(self, tmp_path):
        from raygun_tpu.distributed.queue import FileClaimQueue

        q1 = FileClaimQueue(str(tmp_path / "q"), 2, lease_timeout=0.1)
        b1 = q1.next_block()  # claimed, never marked done (worker died)
        assert b1 in (0, 1)
        q2 = FileClaimQueue(str(tmp_path / "q"), 2, lease_timeout=0.1)
        b2 = q2.next_block()
        assert b2 == 1 - b1  # disjoint claims
        import time as _t

        _t.sleep(0.15)
        assert q2.next_block() == b1  # stale lease reclaimed
        q2.mark_done(0)
        q2.mark_done(1)
        assert q2.next_block() is None
        assert q2.remaining() == 0

    def test_claims_are_amortized_o1(self, tmp_path, monkeypatch):
        """Claiming all N blocks costs O(N) filesystem stats TOTAL, not
        O(N) per claim (VERDICT r2: the old sweep restarted at block 0
        every claim — O(N^2) per worker per volume)."""
        import raygun_tpu.distributed.queue as qmod

        n = 200
        q = qmod.FileClaimQueue(str(tmp_path / "q"), n)
        stats = {"n": 0}
        real_exists = qmod.os.path.exists

        def counting_exists(p):
            stats["n"] += 1
            return real_exists(p)

        monkeypatch.setattr(qmod.os.path, "exists", counting_exists)
        claimed = set()
        for _ in range(n):
            i = q.next_block(wait=False)
            claimed.add(i)
            q.mark_done(i)
        assert claimed == set(range(n))
        # fresh pass stats each block's .done at most once; allow slack for
        # the final remaining() call — the old code needed ~n*n/2 (=20000)
        assert stats["n"] <= 3 * n, stats["n"]
        assert q.next_block(wait=False) is None

    def test_workers_stripe_disjointly(self, tmp_path):
        """Two workers with different ids start their fresh pass at
        different offsets but still cover everything exactly once."""
        from raygun_tpu.distributed.queue import FileClaimQueue

        n = 16
        qa = FileClaimQueue(str(tmp_path / "q"), n, worker_id="alice")
        qb = FileClaimQueue(str(tmp_path / "q"), n, worker_id="bob")
        assert qa._start != qb._start  # crc32 stripes differ for these ids
        got = []
        for q in (qa, qb) * n:
            i = q.next_block(wait=False)
            if i is not None:
                got.append(i)
                q.mark_done(i)
        assert sorted(got) == list(range(n))

    def test_queue_with_device_batch(self, tmp_path, net_and_params):
        """device_batch > 1 in queue mode must not deadlock on the group's
        own leases (27 blocks, batches of 4)."""
        net, params = net_and_params
        rng = np.random.default_rng(6)
        data = rng.random((28, 28, 28)).astype(np.float32)
        vx = Coordinate(10, 10, 10)
        total = Roi((0, 0, 0), Coordinate((28, 28, 28)) * vx)
        path = str(tmp_path / "in.zarr")
        src = prepare_ds(path, "raw", total, vx, np.float32, delete=True)
        src.write(total, data)
        write_roi = total.grow(Coordinate(-20, -20, -20), Coordinate(-20, -20, -20))
        dest = prepare_ds(path, "out", write_roi, vx, np.float32,
                          num_channels=3, delete=True)
        fwd = jax.jit(lambda x: {"out": net.apply({"params": params}, x)})
        r = BlockwiseRunner(
            source=open_ds(path, "raw"), outputs={"out": dest}, fn=fwd,
            input_shape=(12, 12, 12), output_shape=(8, 8, 8),
            device_batch=4, queue_dir=str(tmp_path / "q"),
        )
        s = r.run()
        assert s["blocks"] == 27
        out = open_ds(path, "out").read()
        full = net.apply({"params": params}, jnp.asarray(data)[None, ..., None])
        full = np.moveaxis(np.asarray(full[0]), -1, 0)
        np.testing.assert_allclose(out, full, rtol=0, atol=1e-5)
