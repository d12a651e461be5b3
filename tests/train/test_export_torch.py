"""Torch-checkpoint EXPORT (``train/export_torch.py``): our param trees
must produce state_dicts the reference torch networks accept with
``load_state_dict(strict=True)`` and that reproduce our forwards — the
reverse of the import, proving bidirectional migration."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from raygun_tpu.train.export_torch import export_network
from raygun_tpu.train.import_torch import import_network

from tests.train.test_import_torch import (  # noqa: F401 (fixture)
    ref_networks,
    _cyclegan_config,
)


def _to_torch(sd):
    return {k: torch.from_numpy(np.ascontiguousarray(v).copy())
            for k, v in sd.items()}


@pytest.mark.parametrize("padding", ["valid", "reflect"])
def test_resnet_export_strict_load_and_parity(ref_networks, padding):
    from raygun_tpu.nn.resnet import ResNet

    ours = ResNet(ndims=3, input_nc=1, output_nc=4, ngf=8, n_blocks=2,
                  padding_type=padding)
    side = 68 if padding == "valid" else 36
    x = np.random.default_rng(0).standard_normal(
        (1, 1, side, side, side), np.float32)
    params = jax.device_get(
        ours.init(jax.random.PRNGKey(1),
                  jnp.asarray(np.moveaxis(x, 1, -1)), train=False)["params"]
    )
    sd = export_network(params, padding_type=padding)
    tnet = ref_networks["ResNet"](
        3, input_nc=1, output_nc=4, ngf=8, n_blocks=2, padding_type=padding
    ).eval()
    tnet.load_state_dict(_to_torch(sd), strict=True)
    with torch.no_grad():
        yt = tnet(torch.from_numpy(x)).numpy()
    yj = ours.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)),
                    train=False)
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=2e-4)


def test_unet_export_strict_load_and_parity(ref_networks):
    from raygun_tpu.nn.unet import UNet

    ours = UNet(input_nc=1, ngf=4, fmap_inc_factor=2,
                downsample_factors=((2, 2, 2), (2, 2, 2)))
    x = np.random.default_rng(1).standard_normal(
        (1, 1, 60, 60, 60), np.float32)
    params = jax.device_get(
        ours.init(jax.random.PRNGKey(2),
                  jnp.asarray(np.moveaxis(x, 1, -1)), train=False)["params"]
    )
    sd = export_network(params)
    tnet = ref_networks["UNet"](
        input_nc=1, ngf=4, fmap_inc_factor=2,
        downsample_factors=[(2, 2, 2), (2, 2, 2)],
    ).eval()
    tnet.load_state_dict(_to_torch(sd), strict=True)
    with torch.no_grad():
        yt = tnet(torch.from_numpy(x)).numpy()
    yj = ours.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)),
                    train=False)
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=2e-4)


def test_residualunet_roundtrip_parity(ref_networks):
    """ResidualUNet (global input->output residual, final-flag ConvPass):
    same key layout as UNet — import AND export against the reference."""
    from raygun_tpu.nn.unet import ResidualUNet

    tnet = ref_networks["ResidualUNet"](
        input_nc=1, ngf=4, fmap_inc_factor=2,
        downsample_factors=[(2, 2, 2), (2, 2, 2)],
    ).eval()
    ours = ResidualUNet(input_nc=1, ngf=4, fmap_inc_factor=2,
                        downsample_factors=((2, 2, 2), (2, 2, 2)))
    x = np.random.default_rng(7).standard_normal(
        (1, 1, 60, 60, 60), np.float32)
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    template = jax.device_get(
        ours.init(jax.random.PRNGKey(8), xj, train=False)["params"])

    # import: torch weights -> ours, forwards match
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = import_network(sd, template)
    with torch.no_grad():
        yt = tnet(torch.from_numpy(x)).numpy()
    yj = ours.apply({"params": params}, xj, train=False)
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=2e-4)

    # export: fresh our-side weights -> torch strict load, forwards match
    sd2 = export_network(template)
    tnet.load_state_dict(_to_torch(sd2), strict=True)
    with torch.no_grad():
        yt2 = tnet(torch.from_numpy(x)).numpy()
    yj2 = ours.apply({"params": template}, xj, train=False)
    np.testing.assert_allclose(np.moveaxis(yt2, 1, -1), np.asarray(yj2),
                               atol=2e-4)


def test_discriminator_export_strict_load_and_parity(ref_networks):
    import functools

    from raygun_tpu.nn.discriminator import NLayerDiscriminator

    ours = NLayerDiscriminator(ndims=3, input_nc=1, ngf=8, n_layers=2,
                               norm="instance")
    x = np.random.default_rng(2).standard_normal(
        (1, 1, 32, 32, 32), np.float32)
    params = jax.device_get(
        ours.init(jax.random.PRNGKey(3),
                  jnp.asarray(np.moveaxis(x, 1, -1)), train=False)["params"]
    )
    sd = export_network(params)
    tnet = ref_networks["NLayerDiscriminator3D"](
        input_nc=1, ngf=8, n_layers=2,
        norm_layer=functools.partial(
            torch.nn.InstanceNorm3d, affine=False,
            track_running_stats=False),
    ).eval()
    tnet.load_state_dict(_to_torch(sd), strict=True)
    with torch.no_grad():
        yt = tnet(torch.from_numpy(x)).numpy()
    yj = ours.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)),
                    train=False)
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=2e-4)


def test_export_import_roundtrip_identity(ref_networks):
    """export -> import must be the identity on every leaf (bit-exact)."""
    from raygun_tpu.nn.resnet import ResNet

    ours = ResNet(ndims=3, input_nc=1, output_nc=4, ngf=8, n_blocks=2)
    params = jax.device_get(
        ours.init(jax.random.PRNGKey(4), jnp.zeros((1, 36, 36, 36, 1)),
                  train=False)["params"]
    )
    back = import_network(export_network(params), params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cyclegan_export_cli_end_to_end(ref_networks, tmp_path):
    """Train-side flow: build a CycleGAN system, save its (fresh) state as
    a native checkpoint, run raygun-export-torch, and load the result into
    reference-style torch generators strict=True with forward parity."""
    from raygun_tpu.cli.export_torch import main as export_main
    from raygun_tpu.systems import load_system
    from raygun_tpu.train.state import save_checkpoint

    cfg = tmp_path / "conf.json"
    cfg.write_text(json.dumps(_cyclegan_config(tmp_path)))
    system = load_system(str(cfg))
    system.build_system()
    save_checkpoint(system.checkpoint_basename, 42, system.state)
    g1_params = jax.device_get(system.state.params)["G1"]

    out = str(tmp_path / "exported.pth")
    export_main([str(cfg), out])

    ckpt = torch.load(out, map_location="cpu", weights_only=True)
    sd = ckpt["model_state_dict"]
    g1 = torch.nn.Sequential(
        ref_networks["ResNet"](2, input_nc=1, output_nc=None, ngf=4,
                               n_blocks=1, n_downsampling=1,
                               padding_type="same"),
        torch.nn.Conv2d(4, 1, 1),
    )
    g1.load_state_dict(
        {k[len("netG1."):]: v for k, v in sd.items()
         if k.startswith("netG1.")},
        strict=True,
    )
    g1.eval()
    x = np.random.default_rng(5).standard_normal((1, 1, 32, 32), np.float32)
    with torch.no_grad():
        yt = g1(torch.from_numpy(x)).numpy()
    yj = system.netG1.apply(
        {"params": g1_params}, jnp.asarray(np.moveaxis(x, 1, -1)),
        train=False,
    )
    np.testing.assert_allclose(np.moveaxis(yt, 1, -1), np.asarray(yj),
                               atol=2e-4)
