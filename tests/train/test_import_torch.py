"""Torch-checkpoint import (``train/import_torch.py``): weight-layout
conversions verified numerically against torch itself, plus full-network
forward parity against the REFERENCE torch networks (loaded from
``/root/reference`` when present — skipped otherwise) and the end-to-end
``raygun-import-torch`` flow on tiny CycleGAN / MTLSD systems."""

import json
import os
import shutil
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from raygun_tpu.train.import_torch import (
    conv_kernel_from_torch,
    conv_transpose_kernel_from_torch,
    import_network,
    import_checkpoint,
    load_torch_state_dict,
)

REFERENCE = "/root/reference/src/raygun/torch/networks"


# --------------------------------------------------------------------------
# layout conversions vs torch
# --------------------------------------------------------------------------

def test_conv_kernel_conversion_matches_torch():
    from raygun_tpu.nn.layers import ConvNd

    tc = torch.nn.Conv3d(3, 5, 3, padding=0)
    x = np.random.default_rng(0).standard_normal((1, 3, 8, 8, 8), np.float32)
    with torch.no_grad():
        yt = tc(torch.from_numpy(x)).numpy()
    params = {
        "kernel": jnp.asarray(conv_kernel_from_torch(tc.weight.detach().numpy())),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }
    yj = ConvNd(features=5, kernel_size=(3, 3, 3), padding="valid").apply(
        {"params": params}, jnp.asarray(np.moveaxis(x, 1, -1))
    )
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=1e-5)


def test_conv_transpose_kernel_conversion_matches_torch():
    from raygun_tpu.nn.layers import ConvTransposeNd

    tt = torch.nn.ConvTranspose3d(4, 6, 2, stride=2)
    x = np.random.default_rng(1).standard_normal((1, 4, 5, 5, 5), np.float32)
    with torch.no_grad():
        yt = tt(torch.from_numpy(x)).numpy()
    params = {
        "kernel": jnp.asarray(
            conv_transpose_kernel_from_torch(tt.weight.detach().numpy())
        ),
        "bias": jnp.asarray(tt.bias.detach().numpy()),
    }
    yj = ConvTransposeNd(features=6, kernel_size=(2, 2, 2),
                         strides=(2, 2, 2)).apply(
        {"params": params}, jnp.asarray(np.moveaxis(x, 1, -1))
    )
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=1e-5)


# --------------------------------------------------------------------------
# reference-network forward parity (skipped when /root/reference is absent)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_networks(tmp_path_factory):
    """Load the reference's torch network modules standalone (their package
    __init__ pulls in gunpowder, which this environment lacks)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    root = tmp_path_factory.mktemp("refpkg")
    pkg = root / "raygun" / "torch" / "networks"
    pkg.mkdir(parents=True)
    for part in ("raygun", "raygun/torch", "raygun/torch/networks"):
        (root / part / "__init__.py").touch()
    for f in ("ResNet.py", "utils.py", "UNet.py", "ResidualUNet.py",
              "NLayerDiscriminator.py"):
        shutil.copy(os.path.join(REFERENCE, f), pkg / f)
    fl = root / "funlib" / "learn" / "torch" / "models"
    fl.mkdir(parents=True)
    for part in ("funlib", "funlib/learn", "funlib/learn/torch",
                 "funlib/learn/torch/models"):
        (root / part / "__init__.py").touch()
    (fl / "conv4d.py").write_text(
        "class Conv4d:\n    def __init__(self, *a, **k):\n"
        "        raise NotImplementedError\n"
    )
    sys.path.insert(0, str(root))
    saved = {
        k: sys.modules.pop(k) for k in list(sys.modules)
        if k == "raygun" or k.startswith(("raygun.", "funlib"))
    }
    try:
        import raygun.torch.networks.ResNet as R
        import raygun.torch.networks.UNet as U
        import raygun.torch.networks.ResidualUNet as RU
        import raygun.torch.networks.NLayerDiscriminator as D
        yield {"ResNet": R.ResNet, "UNet": U.UNet,
               "ResidualUNet": RU.ResidualUNet,
               "NLayerDiscriminator3D": D.NLayerDiscriminator3D}
    finally:
        sys.path.remove(str(root))
        for k in list(sys.modules):
            if k == "raygun" or k.startswith(("raygun.", "funlib")):
                del sys.modules[k]
        sys.modules.update(saved)


@pytest.mark.parametrize("padding", ["valid", "reflect"])
def test_resnet_import_forward_parity(ref_networks, padding):
    from raygun_tpu.nn.resnet import ResNet

    tnet = ref_networks["ResNet"](
        3, input_nc=1, output_nc=4, ngf=8, n_blocks=2, padding_type=padding
    ).eval()
    ours = ResNet(ndims=3, input_nc=1, output_nc=4, ngf=8, n_blocks=2,
                  padding_type=padding)
    side = 68 if padding == "valid" else 36
    x = np.random.default_rng(2).standard_normal(
        (1, 1, side, side, side), np.float32)
    template = jax.device_get(
        ours.init(jax.random.PRNGKey(0),
                  jnp.asarray(np.moveaxis(x, 1, -1)), train=False)["params"]
    )
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_network(sd, template)
    with torch.no_grad():
        yt = tnet(torch.from_numpy(x)).numpy()
    yj = ours.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)),
                    train=False)
    np.testing.assert_allclose(
        np.moveaxis(yt, 1, -1), np.asarray(yj), atol=2e-4,
        err_msg=f"ResNet padding={padding}",
    )


def test_unet_import_forward_parity(ref_networks):
    from raygun_tpu.nn.unet import UNet

    tnet = ref_networks["UNet"](
        input_nc=1, ngf=4, fmap_inc_factor=2,
        downsample_factors=[(2, 2, 2), (2, 2, 2)],
    ).eval()
    ours = UNet(input_nc=1, ngf=4, fmap_inc_factor=2,
                downsample_factors=((2, 2, 2), (2, 2, 2)))
    x = np.random.default_rng(3).standard_normal(
        (1, 1, 60, 60, 60), np.float32)
    template = jax.device_get(
        ours.init(jax.random.PRNGKey(0),
                  jnp.asarray(np.moveaxis(x, 1, -1)), train=False)["params"]
    )
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_network(sd, template)
    with torch.no_grad():
        yt = tnet(torch.from_numpy(x)).numpy()
    yj = ours.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)),
                    train=False)
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=2e-4)


def test_discriminator_import_forward_parity(ref_networks):
    from raygun_tpu.nn.discriminator import NLayerDiscriminator

    import functools

    # the reference builds discriminators exactly this way
    # (systems/BaseSystem.py:192-199) — partial(InstanceNorm) => use_bias
    tnet = ref_networks["NLayerDiscriminator3D"](
        input_nc=1, ngf=8, n_layers=2,
        norm_layer=functools.partial(
            torch.nn.InstanceNorm3d, affine=False,
            track_running_stats=False),
    ).eval()
    ours = NLayerDiscriminator(ndims=3, input_nc=1, ngf=8, n_layers=2,
                               norm="instance")
    x = np.random.default_rng(4).standard_normal(
        (1, 1, 32, 32, 32), np.float32)
    template = jax.device_get(
        ours.init(jax.random.PRNGKey(0),
                  jnp.asarray(np.moveaxis(x, 1, -1)), train=False)["params"]
    )
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_network(sd, template)
    with torch.no_grad():
        yt = tnet(torch.from_numpy(x)).numpy()
    yj = ours.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)),
                    train=False)
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=2e-4)


# --------------------------------------------------------------------------
# end-to-end: reference-shaped checkpoints through raygun-import-torch
# --------------------------------------------------------------------------

def _cyclegan_config(root):
    from raygun_tpu.io import make_cyclegan_dataset

    src = make_cyclegan_dataset(
        str(root / "data.zarr"), shape=(96, 96),
        voxel_size_a=(90, 90), voxel_size_b=(90, 90),
    )
    return {
        "system": "CycleGAN",
        "sources": {
            "A": {"path": src["path"], "name": src["A"]},
            "B": {"path": src["path"], "name": src["B"]},
        },
        "common_voxel_size": [90, 90],
        "ndims": 2,
        "side_length": 32,
        "batch_size": 1,
        "gnet_type": "resnet",
        "gnet_kwargs": {"input_nc": 1, "output_nc": 1, "ngf": 4,
                        "n_blocks": 1, "n_downsampling": 1,
                        "padding_type": "same"},
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 2, "kw": 3,
                        "downsampling_kw": 2},
        "g_optim_kwargs": {"lr": 1e-4},
        "d_optim_kwargs": {"lr": 1e-4},
        "model_path": str(root / "models") + "/",
        "num_epochs": 1,
        "save_every": 100,
    }


def _make_torch_generator(ref_networks, ngf=4, n_blocks=1):
    # the reference generator assembly (BaseSystem.get_network:210-224):
    # Sequential(core with output_nc=None -> ngf, 1x1 conv head)
    core = ref_networks["ResNet"](2, input_nc=1, output_nc=None, ngf=ngf,
                                  n_blocks=n_blocks, n_downsampling=1,
                                  padding_type="same")
    head = torch.nn.Conv2d(ngf, 1, 1)
    return torch.nn.Sequential(core, head)


def test_cyclegan_checkpoint_import_end_to_end(ref_networks, tmp_path):
    """A reference-style CycleModel checkpoint (netG1/netG2 Sequential
    generators saved under 'model_state_dict') imports into a built
    CycleGAN system, writes a native checkpoint, and G1's forward equals
    the torch generator's."""
    from raygun_tpu.systems import load_system
    from raygun_tpu.train.state import latest_checkpoint

    g1 = _make_torch_generator(ref_networks).eval()
    g2 = _make_torch_generator(ref_networks).eval()
    sd = {}
    for prefix, net in (("netG1", g1), ("netG2", g2)):
        for k, v in net.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    ckpt_path = str(tmp_path / "model_checkpoint_2500")
    torch.save({"model_state_dict": sd,
                "optimizer_state_dict": {}}, ckpt_path)

    cfg = tmp_path / "conf.json"
    cfg.write_text(json.dumps(_cyclegan_config(tmp_path)))
    system = load_system(str(cfg))
    system.build_system()
    out = import_checkpoint(ckpt_path, system)
    assert out.endswith("_checkpoint_2500")
    found, it = latest_checkpoint(system.checkpoint_basename)
    assert found == out and it == 2500

    x = np.random.default_rng(5).standard_normal((1, 1, 32, 32), np.float32)
    with torch.no_grad():
        yt = g1(torch.from_numpy(x)).numpy()
    yj = system.netG1.apply(
        {"params": jax.device_get(system.state.params)["G1"]},
        jnp.asarray(np.moveaxis(x, 1, -1)), train=False,
    )
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=2e-4)


def test_mtlsd_checkpoint_import_end_to_end(ref_networks, tmp_path):
    """A reference-style MTLSDModel checkpoint (unet/aff_head/lsd_head)
    imports and the affinity head's forward matches torch."""
    from raygun_tpu.io import make_segmentation_dataset
    from raygun_tpu.systems import load_system

    tunet = ref_networks["UNet"](
        input_nc=1, ngf=4, fmap_inc_factor=2,
        downsample_factors=[(2, 2, 2)],
    ).eval()
    num_affs = 3

    class TorchMtlsd(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.unet = tunet
            conv = torch.nn.Conv3d(4, num_affs, 1)
            self.aff_head = torch.nn.Module()
            self.aff_head.conv_pass = torch.nn.Sequential(
                conv, torch.nn.Sigmoid())
            lconv = torch.nn.Conv3d(4, 10, 1)
            self.lsd_head = torch.nn.Module()
            self.lsd_head.conv_pass = torch.nn.Sequential(
                lconv, torch.nn.Sigmoid())

        def forward(self, raw):
            z = self.unet(raw)
            return (self.aff_head.conv_pass(z),
                    self.lsd_head.conv_pass(z))

    tmodel = TorchMtlsd().eval()
    ckpt_path = str(tmp_path / "model_checkpoint_1000")
    torch.save(tmodel.state_dict(), ckpt_path)

    src = make_segmentation_dataset(
        str(tmp_path / "train.zarr"), shape=(48, 48, 48), num_cells=8)
    config = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 3,
        "batch_size": 1,
        "input_shape": [28, 28, 28],
        "output_shape": [12, 12, 12],
        "voxel_size": [30, 30, 30],
        "neighborhood": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": 0,
        "model_kwargs": {
            "unet_kwargs": {
                "input_nc": 1, "ngf": 4, "fmap_inc_factor": 2,
                "downsample_factors": [[2, 2, 2]],
            },
            "num_affs": 3,
        },
        "lsd_kwargs": {"sigma": 120},
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 5e-4},
        "model_path": str(tmp_path / "models") + "/",
        "train_kwargs": {"num_epochs": 1, "save_every": 100},
    }
    cfg = tmp_path / "conf.json"
    cfg.write_text(json.dumps(config))
    system = load_system(str(cfg))
    system.build_system()
    import_checkpoint(ckpt_path, system)

    x = np.random.default_rng(6).standard_normal(
        (1, 1, 28, 28, 28), np.float32)
    with torch.no_grad():
        affs_t, lsds_t = tmodel(torch.from_numpy(x))
    affs_j, lsds_j = system.model.apply(
        {"params": system.state.params},
        jnp.asarray(np.moveaxis(x, 1, -1)), train=False,
    )
    np.testing.assert_allclose(np.moveaxis(affs_t.numpy(), 1, -1),
                               np.asarray(affs_j), atol=2e-4)
    np.testing.assert_allclose(np.moveaxis(lsds_t.numpy(), 1, -1),
                               np.asarray(lsds_j), atol=2e-4)


def test_import_rejects_shape_mismatch(ref_networks, tmp_path):
    """Wrong net kwargs (ngf mismatch) must raise, not silently corrupt."""
    from raygun_tpu.nn.resnet import ResNet

    tnet = ref_networks["ResNet"](3, input_nc=1, output_nc=4, ngf=8,
                                  n_blocks=2, padding_type="valid")
    ours = ResNet(ndims=3, input_nc=1, output_nc=4, ngf=16, n_blocks=2,
                  padding_type="valid")
    template = jax.device_get(
        ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 68, 68, 68, 1)),
                  train=False)["params"]
    )
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    with pytest.raises(ValueError, match="shape"):
        import_network(sd, template)


def test_load_torch_state_dict_bare(tmp_path, ref_networks):
    net = _make_torch_generator(ref_networks)
    p = str(tmp_path / "bare.pth")
    torch.save(net.state_dict(), p)
    sd = load_torch_state_dict(p)
    assert any(k.startswith("0.model.") for k in sd)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
