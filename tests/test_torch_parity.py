"""Numeric parity against the ACTUAL reference torch networks.

These tests import the reference modules from /root/reference, randomly
initialize them, convert the state_dict with models/convert.py, and assert
the flax modules produce the same outputs - turning the docstring parity
claims into evidence (VERDICT r2 #2). Reference-trained checkpoints load
through the same converters.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

# h_vae_model_copy imports torchvision only for Res50CLF; stub it out
# (torchvision is absent in this environment). The stub is MARKED so other
# tests that importorskip("torchvision") for real functionality can detect
# it and still skip (it leaks via sys.modules across the whole pytest
# process - this was an order-dependent failure in full-suite runs).
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tv.__path__ = []  # mark as package so "torchvision.utils" resolves
    tv.models = types.SimpleNamespace(resnet50=lambda *a, **k: None)
    tv.__sbmae_stub__ = True
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.save_image = lambda *a, **k: None
    tv_utils.make_grid = lambda *a, **k: None
    tv.utils = tv_utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = tv_utils

# Some reference modules (polymnist_dataset, train_celeba_diffvae) also do
# ``from torchvision import transforms``; give the stub a transforms
# submodule whose attributes are inert callables (only touched at runtime
# by data pipelines these tests never drive).
_tv = sys.modules["torchvision"]
if getattr(_tv, "__sbmae_stub__", False) and not hasattr(_tv, "transforms"):
    _tv_tr = types.ModuleType("torchvision.transforms")
    _tv_tr.__getattr__ = lambda name: (lambda *a, **k: None)
    _tv.transforms = _tv_tr
    sys.modules["torchvision.transforms"] = _tv_tr

# pytorch_fid/inception.py (imported by fid_upd10) SUBCLASSES
# torchvision.models.inception.Inception{A,C,E} at import time; give the
# stub inert nn.Module bases (never instantiated by these tests).
if getattr(_tv, "__sbmae_stub__", False) and not hasattr(_tv.models,
                                                         "inception"):
    class _StubInceptionBlock(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    _tv.models.inception = types.SimpleNamespace(
        InceptionA=_StubInceptionBlock, InceptionB=_StubInceptionBlock,
        InceptionC=_StubInceptionBlock, InceptionE=_StubInceptionBlock)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from score_based_multimodal_autoencoder_tpu.models.convert import (  # noqa: E402
    load_torch_adm_unet,
    load_torch_resvae,
    load_torch_unet,
)


def _nhwc(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def _assert_close(flax_out_nhwc, torch_out_nchw, atol=1e-4):
    got = np.asarray(flax_out_nhwc).transpose(0, 3, 1, 2)
    want = torch_out_nchw.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol)


@pytest.mark.parametrize("use_convnext", [True, False])
def test_latent_unet_parity_small(use_convnext):
    """Small-config Unet (unet_model.py:189-323) == LatentUNet after weight
    conversion, both block families."""
    import unet_model

    torch.manual_seed(0)
    # ResNet blocks GroupNorm(8) over dim_out -> widths must divide by 8.
    dim, channels, mults = (12 if use_convnext else 16), 3, (1, 2)
    tnet = unet_model.Unet(dim=dim, channels=channels, dim_mults=mults,
                           use_convnext=use_convnext).eval()
    x = torch.randn(2, channels, 8, 8)
    t = torch.rand(2)
    with torch.no_grad():
        want = tnet(x, t)

    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet

    fnet = LatentUNet(dim=dim, channels=channels, dim_mults=mults,
                      use_convnext=use_convnext)
    params = load_torch_unet(tnet.state_dict(), len(mults), use_convnext)
    got = fnet.apply({"params": params}, _nhwc(x),
                     jnp.asarray(t.numpy()))
    _assert_close(got, want)


def test_latent_unet_parity_flagship_config():
    """The shipped PolyMNIST flagship (dim=128, channels=10, (1,2,2,2),
    train_poly_unet_cont.py:567-572) converts and matches end to end."""
    import unet_model

    torch.manual_seed(1)
    dim, channels, mults = 128, 10, (1, 2, 2, 2)
    tnet = unet_model.Unet(dim=dim, channels=channels, dim_mults=mults).eval()
    x = torch.randn(2, channels, 8, 8)
    t = torch.rand(2)
    with torch.no_grad():
        want = tnet(x, t)

    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet

    fnet = LatentUNet(dim=dim, channels=channels, dim_mults=mults)
    params = load_torch_unet(tnet.state_dict(), len(mults))
    got = fnet.apply({"params": params}, _nhwc(x), jnp.asarray(t.numpy()))
    _assert_close(got, want, atol=3e-4)


def test_latent_unet_parity_mxu_depthwise():
    """The MXU-depthwise TPU path is the same math: converted reference
    weights give the same outputs through DepthwiseConvMXU."""
    import unet_model

    torch.manual_seed(2)
    dim, channels, mults = 12, 3, (1, 2)
    tnet = unet_model.Unet(dim=dim, channels=channels, dim_mults=mults).eval()
    x = torch.randn(2, channels, 8, 8)
    t = torch.rand(2)
    with torch.no_grad():
        want = tnet(x, t)

    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet

    fnet = LatentUNet(dim=dim, channels=channels, dim_mults=mults,
                      mxu_depthwise=True)
    params = load_torch_unet(tnet.state_dict(), len(mults))
    got = fnet.apply({"params": params}, _nhwc(x), jnp.asarray(t.numpy()))
    _assert_close(got, want)


def test_adm_unet_parity_attention_heads():
    """ADM UNetModel (unet_openai.py:361-577) == ADMUNet after conversion,
    with multi-head attention exercising the qkv channel-order bridge
    (torch per-head-interleaved vs flax part-contiguous)."""
    import unet_openai as ref

    torch.manual_seed(5)
    kw = dict(in_channels=3, model_channels=32, out_channels=3,
              num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_heads=4)
    tnet = ref.UNetModel(dropout=0.0, **kw).eval()
    x = torch.randn(2, 3, 8, 8)
    t = torch.rand(2) * 10
    with torch.no_grad():
        want = tnet(x, t)

    from score_based_multimodal_autoencoder_tpu.nn.unet_adm import ADMUNet

    fnet = ADMUNet(**kw)
    params = load_torch_adm_unet(
        tnet.state_dict(), kw["model_channels"], kw["num_res_blocks"],
        kw["channel_mult"], kw["attention_resolutions"], kw["num_heads"])
    got = fnet.apply({"params": params}, _nhwc(x), jnp.asarray(t.numpy()))
    _assert_close(got, want)


def test_adm_unet_parity_cond_z_config():
    """The shipped z-conditioned CelebA cond-score shape
    (train_lat_celebhq_unet_cont2_cond.py:651-653: num_res_blocks=2, no
    attention resolutions, use_z) converts and matches, scaled down."""
    import unet_openai as ref

    torch.manual_seed(6)
    kw = dict(in_channels=3, model_channels=32, out_channels=3,
              num_res_blocks=2, attention_resolutions=(),
              channel_mult=(1, 2, 4), num_heads=1, use_z=True, z_dim=16)
    tnet = ref.UNetModel(dropout=0.0, **kw).eval()
    x = torch.randn(2, 3, 8, 8)
    t = torch.rand(2) * 10
    z = torch.randn(2, 16)
    with torch.no_grad():
        want = tnet(x, t, z=z)

    from score_based_multimodal_autoencoder_tpu.nn.unet_adm import ADMUNet

    fnet = ADMUNet(**kw)
    params = load_torch_adm_unet(
        tnet.state_dict(), kw["model_channels"], kw["num_res_blocks"],
        kw["channel_mult"], kw["attention_resolutions"], kw["num_heads"])
    got = fnet.apply({"params": params}, _nhwc(x), jnp.asarray(t.numpy()),
                     z=jnp.asarray(z.numpy()))
    _assert_close(got, want, atol=3e-4)


def test_adm_superres_parity_scale_shift_class():
    """SuperResModel (unet_openai.py:578-593) with scale-shift norm and
    class conditioning == ADMSuperResUNet after conversion (same
    state_dict as UNetModel; low-res concat reproduced)."""
    import unet_openai as ref

    torch.manual_seed(7)
    kw = dict(model_channels=32, out_channels=3, num_res_blocks=1,
              attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
              use_scale_shift_norm=True, num_classes=5)
    tnet = ref.SuperResModel(in_channels=3, dropout=0.0, **kw).eval()
    x = torch.randn(2, 3, 8, 8)
    low = torch.randn(2, 3, 4, 4)
    t = torch.rand(2) * 10
    y = torch.tensor([1, 3])
    with torch.no_grad():
        want = tnet(x, t, low_res=low, y=y)

    from score_based_multimodal_autoencoder_tpu.nn.unet_adm import ADMSuperResUNet

    fnet = ADMSuperResUNet(in_channels=6, **kw)
    params = load_torch_adm_unet(
        tnet.state_dict(), kw["model_channels"], kw["num_res_blocks"],
        kw["channel_mult"], kw["attention_resolutions"], kw["num_heads"])
    got = fnet.apply({"params": params}, _nhwc(x), jnp.asarray(t.numpy()),
                     low_res=_nhwc(low), y=jnp.asarray(y.numpy()))
    _assert_close(got, want)


def test_convert_cli_reference_checkpoints(tmp_path):
    """cli.convert turns torch.save'd reference checkpoints into framework
    orbax checkpoints the pipeline runs directly: a latent score UNet plus a
    2-modality ResVAE fleet, chained through SBMAEPipeline generation."""
    import h_vae_model_copy as href
    import unet_model

    torch.manual_seed(8)
    tnet = unet_model.Unet(dim=12, channels=2, dim_mults=(1, 2)).eval()
    torch.save({"model_state_dict": tnet.state_dict(),
                "epoch": 7}, tmp_path / "score.pt")
    enc = [(64, 64, 64, 2), (64, 128, 128, 2), (128, 256, 256, 2)]
    dec = [(256, 128, 128, 2), (128, 128, 64, 2), (64, 64, 64, 2)]
    for i in range(2):
        tvae = href.ResVAE(enc, dec, size_in=32, size_z=64, img_ch=3).eval()
        torch.save({"model_state_dict": tvae.state_dict()},
                   tmp_path / f"m{i}.pt")

    from score_based_multimodal_autoencoder_tpu.cli import convert

    convert.main(["--arch", "unet", "--torch-ckpt", str(tmp_path / "score.pt"),
                  "--out", str(tmp_path / "score"), "--dim", "12",
                  "--channels", "2", "--dim-mults", "1,2"])
    convert.main(["--arch", "resvae", "--preset", "polymnist",
                  "--torch-ckpt", str(tmp_path / "m0.pt"),
                  "--torch-ckpt", str(tmp_path / "m1.pt"),
                  "--out", str(tmp_path / "vae")])

    from score_based_multimodal_autoencoder_tpu.diffusion import VPSDE
    from score_based_multimodal_autoencoder_tpu.models.vae import polymnist_vae
    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet
    from score_based_multimodal_autoencoder_tpu.parallel.fleet import VAEFleet
    from score_based_multimodal_autoencoder_tpu.pipeline import SBMAEPipeline
    from score_based_multimodal_autoencoder_tpu.train.checkpoints import (
        CheckpointManager,
    )
    from score_based_multimodal_autoencoder_tpu.train.lr import (
        adam_with_mutable_lr,
    )

    score = CheckpointManager(str(tmp_path / "score")).restore_raw("last")
    assert int(score["epoch"]) == 0
    fleet_state = CheckpointManager(str(tmp_path / "vae")).restore_raw("last")
    assert fleet_state["params"]["enc"]["stem_conv"]["kernel"].shape[0] == 2

    fleet = VAEFleet(polymnist_vae(64), 2, adam_with_mutable_lr(1e-3))
    pipe = SBMAEPipeline(
        fleet=fleet, fleet_state=fleet_state,
        score_model=LatentUNet(dim=12, channels=2, dim_mults=(1, 2)),
        score_params=score["params"], sde=VPSDE(N=4), latent_hw=8)
    out = pipe.sample_unconditional(jax.random.key(0), amount=2)
    assert out.shape == (2, 2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_resvae_poly_parity():
    """Reference ResVAE (h_vae_model_copy.py:91-137) at the shipped
    PolyMNIST config == models.vae.ResVAE('poly') after conversion:
    encoder (mu, logvar) and decoder output."""
    import h_vae_model_copy as ref

    torch.manual_seed(3)
    enc = [(64, 64, 64, 2), (64, 128, 128, 2), (128, 256, 256, 2)]
    dec = [(256, 128, 128, 2), (128, 128, 64, 2), (64, 64, 64, 2)]
    tvae = ref.ResVAE(enc, dec, size_in=32, size_z=64, img_ch=3).eval()

    from score_based_multimodal_autoencoder_tpu.models import ResVAE

    fvae = ResVAE(tuple(map(tuple, enc)), tuple(map(tuple, dec)),
                  size_in=32, size_z=64, img_ch=3, variant="poly")
    variables = load_torch_resvae(tvae.state_dict(), enc, dec, 32, 64)

    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        mu_t, logvar_t = tvae.encoder(x)
    mu_f, logvar_f = fvae.apply(variables, _nhwc(x), method=fvae.encoder)
    np.testing.assert_allclose(np.asarray(mu_f), mu_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_f), logvar_t.numpy(),
                               rtol=1e-3, atol=1e-4)

    z = torch.randn(2, 64)
    with torch.no_grad():
        out_t = tvae.decoder(z)
    out_f = fvae.apply(variables, jnp.asarray(z.numpy()), method=fvae.decoder)
    _assert_close(out_f, out_t)


def test_resvaen_celeb_parity():
    """Reference ResVAEN (h_vae_model_copy.py:457-547; GELU blocks,
    LeakyReLU-0.1 stem, bilinear upsample, sigmoid head, plain-RBlock head
    block) == variant='celeb' after conversion."""
    import h_vae_model_copy as ref

    torch.manual_seed(4)
    enc = [(8, 16, 16, 2), (16, 32, 32, 2)]
    dec = [(32, 16, 16, 2), (16, 16, 16, 2)]
    tvae = ref.ResVAEN(enc, dec, size_in=32, size_z=16, img_ch=3).eval()

    from score_based_multimodal_autoencoder_tpu.models import ResVAE

    fvae = ResVAE(tuple(map(tuple, enc)), tuple(map(tuple, dec)),
                  size_in=32, size_z=16, img_ch=3, variant="celeb")
    variables = load_torch_resvae(tvae.state_dict(), enc, dec, 32, 16)

    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        mu_t, logvar_t = tvae.encoder(x)
    mu_f, logvar_f = fvae.apply(variables, _nhwc(x), method=fvae.encoder)
    np.testing.assert_allclose(np.asarray(mu_f), mu_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_f), logvar_t.numpy(),
                               rtol=1e-3, atol=1e-4)

    z = torch.randn(2, 16)
    with torch.no_grad():
        out_t = tvae.decoder(z)
    out_f = fvae.apply(variables, jnp.asarray(z.numpy()), method=fvae.decoder)
    _assert_close(out_f, out_t)


def test_attr_vae_parity():
    """Reference CelebAAttrNewBN (h_vae_model.py:712-779) ==
    models.vae.AttributeVAE after conversion: encoder (mu, logvar) and
    decoder logits, eval-mode BatchNorm1d."""
    import h_vae_model as ref

    from score_based_multimodal_autoencoder_tpu.models import AttributeVAE
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_attr_vae,
    )

    torch.manual_seed(5)
    tnet = ref.CelebAAttrNewBN(size_z=24, att_size=18).eval()
    fnet = AttributeVAE(size_z=24, att_size=18)
    variables = load_torch_attr_vae(tnet.state_dict())

    x = (torch.rand(4, 18) > 0.5).float()
    with torch.no_grad():
        mu_t, logvar_t = tnet.encoder(x)
    mu_f, logvar_f = fnet.apply(variables, jnp.asarray(x.numpy()),
                                method=fnet.encoder)
    np.testing.assert_allclose(np.asarray(mu_f), mu_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_f), logvar_t.numpy(),
                               rtol=1e-3, atol=1e-4)

    z = torch.randn(4, 24)
    with torch.no_grad():
        out_t = tnet.decoder(z)
    out_f = fnet.apply(variables, jnp.asarray(z.numpy()), method=fnet.decoder)
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_attr_ae_parity():
    """Reference CelebAAttrNewBNAE (h_vae_model.py:839-899; no logvar head)
    converts through the same path; encoder mu + decoder match."""
    import h_vae_model as ref

    from score_based_multimodal_autoencoder_tpu.models import AttributeVAE
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_attr_vae,
    )

    torch.manual_seed(6)
    tnet = ref.CelebAAttrNewBNAE(size_z=24).eval()
    fnet = AttributeVAE(size_z=24, att_size=18)
    variables = load_torch_attr_vae(tnet.state_dict())

    x = (torch.rand(4, 18) > 0.5).float()
    with torch.no_grad():
        mu_t = tnet.encoder(x)
        out_t = tnet.decoder(mu_t)
    mu_f, _ = fnet.apply(variables, jnp.asarray(x.numpy()),
                         method=fnet.encoder)
    out_f = fnet.apply(variables, mu_f, method=fnet.decoder)
    np.testing.assert_allclose(np.asarray(mu_f), mu_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_pmclf_parity():
    """Reference PMCLF (polymnist_model.py:372-392) == PolyMNISTClassifier
    after conversion (incl. the NCHW->NHWC fc1 basis permutation)."""
    import polymnist_model as ref

    from score_based_multimodal_autoencoder_tpu.models import (
        PolyMNISTClassifier,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_pmclf,
    )

    torch.manual_seed(7)
    tnet = ref.PMCLF().eval()
    params = load_torch_pmclf(tnet.state_dict())

    x = torch.rand(3, 3, 28, 28)
    with torch.no_grad():
        out_t = tnet(x)
    out_f = PolyMNISTClassifier().apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_resclf_parity():
    """Reference ResCLF (h_vae_model_copy.py:208-235) == ResClassifier
    after conversion (the FGSM adversarial-eval target)."""
    import h_vae_model_copy as ref

    from score_based_multimodal_autoencoder_tpu.models import ResClassifier
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_resclf,
    )

    torch.manual_seed(8)
    channel_list = [(8, 16, 16, 2), (16, 32, 32, 2)]
    tnet = ref.ResCLF(channel_list, size_in=32, size_out=18, img_ch=3).eval()
    variables = load_torch_resclf(tnet.state_dict(), channel_list, size_in=32)

    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        out_t = tnet(x)
    out_f = ResClassifier(tuple(map(tuple, channel_list)),
                          size_out=18).apply(variables, _nhwc(x))
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_mopoe_clf_parity():
    """Reference ClfImg (h_vae_model_copy.py:327-342; weighted-residual
    FeatureExtractorImg) == MoPoEImageClassifier after conversion on 64x64
    inputs."""
    import h_vae_model_copy as ref

    from score_based_multimodal_autoencoder_tpu.models.classifiers import (
        MoPoEImageClassifier,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_mopoe_clf,
    )

    torch.manual_seed(9)
    tnet = ref.ClfImg().eval()
    variables = load_torch_mopoe_clf(tnet.state_dict())

    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        out_t = tnet(x)
    out_f = MoPoEImageClassifier().apply(variables, _nhwc(x))
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-3, atol=2e-4)


def test_mixture_vaes_parity():
    """Reference MOPOEPolyRes (mopoe_model.py:310-360; shared by the MMVAE/
    MVAE/MVTCAE classes, which hold the identical vae_list) ==
    MixtureMultimodalVAE after load_torch_mixture_vaes: per-modality encoder
    (mu, logvar) and same-z decode."""
    import mopoe_model as ref

    from score_based_multimodal_autoencoder_tpu.models.baselines.mixture import (
        MixtureMultimodalVAE,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_mixture_vaes,
    )

    torch.manual_seed(11)
    enc = [(8, 16, 16, 2), (16, 32, 32, 2)]
    dec = [(32, 16, 16, 2), (16, 16, 16, 2)]
    n_mod = 2
    tnet = ref.MOPOEPolyRes(n_mod, enc, dec, size_z=16, size_in=32,
                            img_ch=3).eval()
    variables = load_torch_mixture_vaes(tnet.state_dict(), n_mod, enc, dec,
                                        size_in=32, size_z=16)

    fnet = MixtureMultimodalVAE(
        n_mod, tuple(map(tuple, enc)), tuple(map(tuple, dec)),
        size_in=32, size_z=16, img_ch=3)

    x = torch.rand(n_mod, 2, 3, 32, 32)
    x_f = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))
    mus_f, logvars_f = fnet.apply(variables, x_f, False,
                                  method=fnet.encode_all)
    with torch.no_grad():
        for m in range(n_mod):
            mu_t, logvar_t = tnet.vae_list[m].encoder(x[m])
            np.testing.assert_allclose(np.asarray(mus_f[m]), mu_t.numpy(),
                                       rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(np.asarray(logvars_f[m]),
                                       logvar_t.numpy(), rtol=1e-3, atol=1e-4)

    z = torch.randn(2, 16)
    outs_f = fnet.apply(variables, jnp.asarray(z.numpy()), False,
                        method=fnet.decode_all_same_z)
    with torch.no_grad():
        for m in range(n_mod):
            out_t = tnet.vae_list[m].decoder(z)
            _assert_close(outs_f[m], out_t)


def test_mmplus_res_parity():
    """Reference PolyMNIST_10modalities (mmplus_model.py:323-385; house
    ResEncoder/ResDecoder nets) == MMVAEPlus(arch='res') after
    load_torch_mmplus: softmax-scaled posterior params and per-decoder
    means."""
    import mmplus_model as ref

    from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus import (
        MMVAEPlus,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_mmplus,
    )

    torch.manual_seed(12)
    params = types.SimpleNamespace(n_mod=2, latent_dim_w=4, latent_dim_z=4,
                                   learn_prior_w_polymnist=True,
                                   tmpdir="/tmp")
    tnet = ref.PolyMNIST_10modalities(params).eval()
    # Give each modality a DISTINCT learned w-prior so the per-modality
    # stacking is actually exercised (zero-init rows are indistinguishable).
    for vae in tnet.vaes:
        vae._pw_params[1].data = torch.randn(1, 4) * 0.3
    enc = [(64, 64, 64, 2), (64, 128, 128, 2), (128, 256, 256, 2)]
    dec = [(256, 128, 128, 2), (128, 128, 64, 2), (64, 64, 64, 2)]
    variables = load_torch_mmplus(tnet.state_dict(), 2, enc, dec,
                                  size_in=32, dim_u=8)

    fnet = MMVAEPlus(n_mod=2, latent_dim_w=4, latent_dim_z=4, arch="res")

    x = torch.rand(2, 2, 3, 32, 32)
    x_f = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))
    loc_f, scale_f = fnet.apply(variables, x_f, False, method=fnet.encode)
    with torch.no_grad():
        for m in range(2):
            loc_t, scale_t = tnet.vaes[m].enc(x[m])
            np.testing.assert_allclose(np.asarray(loc_f[m]), loc_t.numpy(),
                                       rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(np.asarray(scale_f[m]),
                                       scale_t.numpy(), rtol=1e-3, atol=1e-5)

    us = torch.randn(2, 3, 8)
    outs_f = fnet.apply(variables, jnp.asarray(us.numpy()), False,
                        method=fnet.decode_all)
    with torch.no_grad():
        for m in range(2):
            out_t, _ = tnet.vaes[m].dec(us[m : m + 1])  # (1, 3, C, H, W)
            _assert_close(outs_f[m], out_t[0], atol=2e-4)

    # The PER-MODALITY w-prior scale params convert too (stacked rows).
    for m in range(2):
        np.testing.assert_allclose(
            np.asarray(variables["params"]["pw_raw"][m]),
            tnet.vaes[m]._pw_params[1].detach().numpy()[0])


def test_mask_rep_encoder_parity():
    """Reference CelMaskRep (h_vae_model.py:1057-1070: ResEncoderN +
    ProjectionHead) == ImageRepEncoder after load_torch_rep_encoder (the
    contrastive-pretraining rep net; CelImgRep differs only in config)."""
    import h_vae_model as ref

    from score_based_multimodal_autoencoder_tpu.nn.contrastive import (
        ImageRepEncoder,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_rep_encoder,
    )

    torch.manual_seed(13)
    tnet = ref.CelMaskRep(size_z=512).eval()
    channel_list = tnet.enc_channel_list1
    variables = load_torch_rep_encoder(tnet.state_dict(), channel_list,
                                       size_in=128)

    fnet = ImageRepEncoder(tuple(map(tuple, channel_list)), size_in=128,
                           size_z=512, img_ch=1, dropout=0.2)

    x = torch.rand(2, 1, 128, 128)
    with torch.no_grad():
        want = tnet(x)
    got = fnet.apply(variables, _nhwc(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-3, atol=2e-4)


def test_attr_rep_encoder_parity():
    """Reference CelAttrRep (h_vae_model.py:987-998) == AttrRepEncoder after
    load_torch_attr_rep."""
    import h_vae_model as ref

    from score_based_multimodal_autoencoder_tpu.nn.contrastive import (
        AttrRepEncoder,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_attr_rep,
    )

    torch.manual_seed(14)
    tnet = ref.CelAttrRep(att_size=18, size_z=512).eval()
    variables = load_torch_attr_rep(tnet.state_dict())

    fnet = AttrRepEncoder(att_size=18, size_z=512)

    x = (torch.rand(4, 18) > 0.5).float()
    with torch.no_grad():
        want = tnet(x)
    got = fnet.apply(variables, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_flat_score_mlp_parity():
    """Reference LSMPoly64_sm (lat_sm2_model.py:348-371) == FlatScoreMLP
    after conversion (the annealed-Langevin eval score net)."""
    import lat_sm2_model as ref

    from score_based_multimodal_autoencoder_tpu.nn.mlp_scores import (
        FlatScoreMLP,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_flat_score,
    )

    torch.manual_seed(10)
    tnet = ref.LSMPoly64_sm(n_mod=2, size_z=16).eval()
    params = load_torch_flat_score(tnet.state_dict())

    x = torch.randn(4, 32)
    with torch.no_grad():
        out_t = tnet(x)
    out_f = FlatScoreMLP(hidden_mults=(2, 6, 6, 4, 2, 1)).apply(
        {"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Composition parity: the reference's SAMPLING and LOSS code paths (not just
# its networks) against this framework's, driven through the SAME converted
# weights. The reference's conditional loops are not importable (their
# modules import the upstream-missing ClwithTime classes, SURVEY.md §7.3);
# sde_helper2's samplers/losses are, so they are cross-checked directly.
# ---------------------------------------------------------------------------

def _tiny_converted_unet(seed=21, dim=16, channels=3, mults=(1, 2)):
    """A reference torch Unet + the converted flax LatentUNet, wrapped as
    the two frameworks' ``score_fn(x, t)`` conventions (NCHW / NHWC)."""
    import unet_model

    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet

    torch.manual_seed(seed)
    tnet = unet_model.Unet(dim=dim, channels=channels,
                           dim_mults=mults).eval()
    fnet = LatentUNet(dim=dim, channels=channels, dim_mults=mults)
    params = load_torch_unet(tnet.state_dict(), len(mults))

    def torch_score(x, t):
        with torch.no_grad():
            return tnet(x, t)

    def jax_score(x, t):
        return fnet.apply({"params": params}, x, t)

    return torch_score, jax_score


def test_uncond_sampler_trajectory_parity(monkeypatch):
    """Reference ``uncond_sampler`` (sde_helper2.py:115-128) == this repo's
    ``unconditional_sampler`` over a FULL 20-step reverse-VP trajectory
    through the same converted UNet, with the Gaussian noise zeroed on both
    sides (prior included), i.e. the deterministic mean path. Cross-checks
    the dt/timestep conventions, reverse-drift composition, x_mean endpoint
    semantics and the NHWC bridge through the reference's actual loop."""
    import sde_helper2 as ref

    from score_based_multimodal_autoencoder_tpu.diffusion.samplers import (
        unconditional_sampler,
    )
    from score_based_multimodal_autoencoder_tpu.diffusion.sde import VPSDE

    torch_score, jax_score = _tiny_converted_unet(seed=21)
    N = 20
    tsde = ref.VPSDE(beta_min=0.1, beta_max=20, N=N)
    fsde = VPSDE(N=N)

    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.zeros_like(x))
    monkeypatch.setattr(torch, "randn",
                        lambda *s, **k: torch.zeros(*s, **k))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))

    want = ref.uncond_sampler((2, 3, 8, 8), torch_score, "cpu", tsde,
                              eps=1e-3, pc=False)
    got = unconditional_sampler(jax.random.key(0), jax_score, fsde,
                                (2, 8, 8, 3), eps=1e-3, pc=False)
    _assert_close(got, want, atol=2e-3)


def test_em_predictor_step_parity(monkeypatch):
    """Reference ``em_predictor`` (sde_helper2.py:45-52) == this repo's
    ``em_predictor_step`` for one step with the SAME injected non-zero
    noise: covers the diffusion term, not just the drift."""
    import sde_helper2 as ref

    from score_based_multimodal_autoencoder_tpu.diffusion.samplers import (
        em_predictor_step,
    )
    from score_based_multimodal_autoencoder_tpu.diffusion.sde import VPSDE

    torch_score, jax_score = _tiny_converted_unet(seed=22)
    N = 30
    tsde = ref.VPSDE(beta_min=0.1, beta_max=20, N=N)
    fsde = VPSDE(N=N)

    rng = np.random.RandomState(5)
    x_nchw = rng.randn(2, 3, 8, 8).astype(np.float32)
    z_nchw = rng.randn(2, 3, 8, 8).astype(np.float32)
    t_np = np.array([0.4, 0.7], np.float32)

    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.from_numpy(z_nchw))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.asarray(
            z_nchw.transpose(0, 2, 3, 1), dtype))

    x_t, xm_t = ref.em_predictor(torch.from_numpy(x_nchw),
                                 torch.from_numpy(t_np), torch_score, tsde)
    x_f, xm_f = em_predictor_step(
        jax.random.key(0), jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(t_np), jax_score, fsde)
    _assert_close(x_f, x_t, atol=2e-4)
    _assert_close(xm_f, xm_t, atol=2e-4)


def test_corrector_step_parity(monkeypatch):
    """Reference ``corrector`` (sde_helper2.py:54-106) == this repo's
    ``langevin_corrector_step`` for one Langevin step with the SAME
    injected noise: covers the SNR step-size rule (batch-mean norms), the
    DDPM-alpha lookup and the x/x_mean pair."""
    import sde_helper2 as ref

    from score_based_multimodal_autoencoder_tpu.diffusion.samplers import (
        langevin_corrector_step,
    )
    from score_based_multimodal_autoencoder_tpu.diffusion.sde import VPSDE

    torch_score, jax_score = _tiny_converted_unet(seed=23)
    N = 30
    tsde = ref.VPSDE(beta_min=0.1, beta_max=20, N=N)
    fsde = VPSDE(N=N)

    rng = np.random.RandomState(7)
    x_nchw = rng.randn(2, 3, 8, 8).astype(np.float32)
    z_nchw = rng.randn(2, 3, 8, 8).astype(np.float32)
    t_np = np.array([0.25, 0.9], np.float32)

    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.from_numpy(z_nchw))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.asarray(
            z_nchw.transpose(0, 2, 3, 1), dtype))

    x_t, xm_t = ref.corrector(torch.from_numpy(x_nchw),
                              torch.from_numpy(t_np), torch_score, tsde,
                              n_steps=1, target_snr=0.16)
    x_f, xm_f = langevin_corrector_step(
        jax.random.key(0), jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(t_np), jax_score, fsde, n_steps=1, target_snr=0.16)
    _assert_close(x_f, x_t, atol=2e-4)
    _assert_close(xm_f, xm_t, atol=2e-4)


@pytest.mark.parametrize("likelihood_weighting", [False, True])
def test_dsm_loss_parity(monkeypatch, likelihood_weighting):
    """Reference ``loss_fn`` (sde_helper2.py:152-186) == this repo's
    ``dsm_loss`` with the SAME injected (t, z) draws and the same converted
    net, for both the standard and the g^2-weighted objectives."""
    import sde_helper2 as ref

    from score_based_multimodal_autoencoder_tpu.diffusion.losses import (
        dsm_loss,
    )
    from score_based_multimodal_autoencoder_tpu.diffusion.sde import VPSDE

    torch_score, jax_score = _tiny_converted_unet(seed=24)
    tsde = ref.VPSDE(beta_min=0.1, beta_max=20, N=100)
    fsde = VPSDE(N=100)

    rng = np.random.RandomState(11)
    batch_nchw = rng.rand(4, 3, 8, 8).astype(np.float32)
    z_nchw = rng.randn(4, 3, 8, 8).astype(np.float32)
    eps = 1e-5
    t_np = rng.uniform(eps, 1.0, 4).astype(np.float32)
    # reference draws u~U(0,1) then maps t = u*(T-eps)+eps
    u_np = ((t_np - eps) / (tsde.T - eps)).astype(np.float32)

    monkeypatch.setattr(torch, "rand",
                        lambda *s, **k: torch.from_numpy(u_np))
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.from_numpy(z_nchw))
    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape=(), minval=0.0, maxval=1.0, **k: jnp.asarray(t_np))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.asarray(
            z_nchw.transpose(0, 2, 3, 1), dtype))

    want = ref.loss_fn(torch.from_numpy(batch_nchw), torch_score, tsde,
                       reduce_mean=True,
                       likelihood_weighting=likelihood_weighting, eps=eps)
    got = dsm_loss(jax.random.key(0), jax_score, fsde,
                   jnp.asarray(batch_nchw.transpose(0, 2, 3, 1)),
                   reduce_mean=True,
                   likelihood_weighting=likelihood_weighting,
                   importance_sampling=False, eps=eps)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_annealed_gen_ae_parity(monkeypatch):
    """Reference ``gen_ae`` (fid_upd10.py:56-110) == this repo's
    ``annealed_langevin_sampler`` over the FULL 200-level x 20-iter
    annealed-Langevin trajectory through the same converted sigma-indexed
    UNet, noise zeroed on both sides. Identity "AEs" isolate the Langevin
    loop (the ResAE encode/decode parity is covered separately); the score
    net is scaled by 0.01 to keep the 4000-step mean path well-conditioned
    under random weights."""
    import fid_upd10 as ref

    from score_based_multimodal_autoencoder_tpu.diffusion.annealed import (
        annealed_langevin_sampler,
    )
    from score_based_multimodal_autoencoder_tpu.nn import LatentUNet

    import unet_model

    torch.manual_seed(25)
    dim, channels, mults = 16, 2, (1, 2)
    tnet = unet_model.Unet(dim=dim, channels=channels, dim_mults=mults).eval()
    fnet = LatentUNet(dim=dim, channels=channels, dim_mults=mults)
    params = load_torch_unet(tnet.state_dict(), len(mults))

    class _Scaled(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.net = net

        def forward(self, x, t):
            return self.net(x, t) * 0.01

    class _IdentityAE(torch.nn.Module):
        @staticmethod
        def encoder(p):
            return p

        @staticmethod
        def decoder(z):
            return z

    monkeypatch.setattr(
        torch, "normal",
        lambda mean=0, std=1, size=(), **k: torch.zeros(size))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))

    B, size_z = 2, 64
    rng = np.random.RandomState(13)
    p0 = rng.randn(B, size_z).astype(np.float32)
    pae_dict = {"0": _IdentityAE(), "1": _IdentityAE()}
    p = {"0": torch.from_numpy(p0), "1": torch.zeros(B, size_z)}
    with torch.no_grad():
        want = ref.gen_ae(_Scaled(tnet), pae_dict, "1", "01", p, B,
                          "cpu", size_z)  # (B, 64): the predicted latent

    def score_fn(x, idx, sig):
        return fnet.apply({"params": params}, x,
                          idx.astype(jnp.float32)) * 0.01

    x_init = jnp.stack(
        [jnp.asarray(p0.reshape(B, 8, 8)), jnp.zeros((B, 8, 8))], axis=-1)
    # gen_ae's (er, c, iter) rule for len(predicted) != 10
    # (fid_upd10.py:68-71) = this sampler's defaults.
    out = annealed_langevin_sampler(
        jax.random.key(0), score_fn, x_init,
        jnp.array([False, True]), sigma_max=5.0, sigma_min=0.1,
        n_levels=200, er=2e-3, c=0.5, iter_num=20)
    got = np.asarray(out[..., 1]).reshape(B, size_z)
    np.testing.assert_allclose(got, want.numpy(), rtol=5e-3, atol=1e-3)


def test_ddpm_refiner_parity(monkeypatch):
    """Reference DiffuseVAE refiner core (train_celeba_diffvae.py:67-113):
    the module-level schedule tables, ``q_sample`` and ``diff_losses``
    match this repo's DDPMSchedule/q_sample/ddpm_refiner_loss with the
    SAME injected (t, noise) and the same converted tiny ADM UNet."""
    import train_celeba_diffvae as ref

    from score_based_multimodal_autoencoder_tpu.diffusion import ddpm
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_adm_unet,
    )
    from score_based_multimodal_autoencoder_tpu.nn.unet_adm import ADMUNet

    sched = ddpm.DDPMSchedule(timesteps=1000)
    tab = sched.tables()
    np.testing.assert_allclose(np.asarray(tab["betas"]),
                               ref.betas.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tab["sqrt_recip_alphas"]),
                               ref.sqrt_recip_alphas.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tab["sqrt_alphas_cumprod"]),
                               ref.sqrt_alphas_cumprod.numpy(), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tab["sqrt_1m_alphas_cumprod"]),
        ref.sqrt_one_minus_alphas_cumprod.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tab["posterior_variance"]),
                               ref.posterior_variance.numpy(),
                               rtol=1e-4, atol=1e-9)

    import unet_openai

    torch.manual_seed(26)
    kw = dict(in_channels=6, model_channels=32, out_channels=3,
              num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_heads=1)
    tnet = unet_openai.UNetModel(dropout=0.0, **kw).eval()
    variables = {"params": load_torch_adm_unet(
        tnet.state_dict(), kw["model_channels"], kw["num_res_blocks"],
        kw["channel_mult"], kw["attention_resolutions"], kw["num_heads"])}
    fnet = ADMUNet(**kw)

    rng = np.random.RandomState(17)
    B = 2
    x0_nchw = rng.rand(B, 3, 8, 8).astype(np.float32) * 2 - 1
    cond_nchw = rng.rand(B, 3, 8, 8).astype(np.float32) * 2 - 1
    noise_nchw = rng.randn(B, 3, 8, 8).astype(np.float32)
    t_np = np.array([17, 940], np.int64)

    # q_sample with the same injected noise.
    want_q = ref.q_sample(torch.from_numpy(x0_nchw),
                          torch.from_numpy(t_np),
                          noise=torch.from_numpy(noise_nchw))
    got_q = ddpm.q_sample(sched, jnp.asarray(x0_nchw.transpose(0, 2, 3, 1)),
                          jnp.asarray(t_np),
                          jnp.asarray(noise_nchw.transpose(0, 2, 3, 1)))
    _assert_close(got_q, want_q, atol=1e-5)

    # diff_losses with the same injected (t, noise) and converted net.
    def torch_denoise(x, t):
        with torch.no_grad():
            return tnet(x, t)

    want = ref.diff_losses(torch_denoise, torch.from_numpy(x0_nchw),
                           torch.from_numpy(cond_nchw),
                           torch.from_numpy(t_np),
                           noise=torch.from_numpy(noise_nchw))
    monkeypatch.setattr(
        jax.random, "randint",
        lambda key, shape, minval, maxval, **k: jnp.asarray(t_np))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.asarray(
            noise_nchw.transpose(0, 2, 3, 1), dtype))

    def jax_denoise(x, t):
        return fnet.apply(variables, x, t.astype(jnp.float32))

    got = ddpm.ddpm_refiner_loss(
        jax.random.key(0), jax_denoise, sched,
        jnp.asarray(x0_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(cond_nchw.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(got), float(want), rtol=5e-4)


def test_mopoe_forward_and_cond_gen_parity(monkeypatch):
    """Reference MOPOEPolyRes.forward / cond_gen (mopoe_model.py:364-467)
    == MixtureMultimodalVAE.forward_mopoe / cond_gen with identical
    injected reparametrization noise and subset permutation: cross-checks
    the masked-matmul powerset PoE (prior expert on the full subset only,
    singleton bypass), the block-stratified mixture selection, and the
    conditional within-subset selection against the reference's actual
    Python-loop implementation."""
    import mopoe_model as ref

    from score_based_multimodal_autoencoder_tpu.models.baselines.mixture import (
        MixtureMultimodalVAE,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_mixture_vaes,
    )

    torch.manual_seed(27)
    enc = [(8, 16, 16, 2), (16, 32, 32, 2)]
    dec = [(32, 16, 16, 2), (16, 16, 16, 2)]
    n_mod, B, size_z = 2, 8, 16
    S = 3  # non-empty subsets of 2 modalities: (0,), (1,), (0, 1)
    tnet = ref.MOPOEPolyRes(n_mod, enc, dec, size_z=size_z, size_in=32,
                            img_ch=3).eval()
    variables = load_torch_mixture_vaes(tnet.state_dict(), n_mod, enc, dec,
                                        size_in=32, size_z=size_z)
    fnet = MixtureMultimodalVAE(
        n_mod, tuple(map(tuple, enc)), tuple(map(tuple, dec)),
        size_in=32, size_z=size_z, img_ch=3)

    rng = np.random.RandomState(19)
    # One noise row per powerset subset, in the reference's
    # combinations-by-size order (= powerset_masks order).
    noise_all = rng.randn(S, B, size_z).astype(np.float32)
    perm = np.array([2, 0, 1])

    calls = {"i": 0}

    def fake_torch_normal(mean=0, std=1, size=(), **k):
        out = torch.from_numpy(noise_all[calls["i"] % S])
        calls["i"] += 1
        return out

    g = np.empty(S, np.float32)
    g[perm] = np.arange(S, 0, -1)  # gumbel-top-k order == perm

    monkeypatch.setattr(torch, "normal", fake_torch_normal)
    monkeypatch.setattr(torch, "randperm",
                        lambda n, **k: torch.from_numpy(perm[:n]))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.asarray(noise_all))
    monkeypatch.setattr(
        jax.random, "permutation",
        lambda key, x, **k: jnp.asarray(perm))
    monkeypatch.setattr(
        jax.random, "gumbel",
        lambda key, shape=(), **k: jnp.asarray(g))

    x = torch.rand(n_mod, B, 3, 32, 32)
    x_f = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))

    # forward: powerset PoE + stratified mixture.
    calls["i"] = 0
    with torch.no_grad():
        outs_t, mus_t, logvars_t = tnet(list(x), sample_len=32)
    outs_f, poe_mu_f, poe_logvar_f = fnet.apply(
        variables, x_f, jax.random.key(0), 32, False,
        method=fnet.forward_mopoe)
    for s in range(S):
        np.testing.assert_allclose(np.asarray(poe_mu_f[s]),
                                   mus_t[s].numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(poe_logvar_f[s]),
                                   logvars_t[s].numpy(), rtol=1e-3,
                                   atol=1e-4)
    for m in range(n_mod):
        _assert_close(outs_f[m], outs_t[m], atol=2e-4)

    # cond_gen, singleton given-set (reference's no-powerset branch).
    calls["i"] = 0
    with torch.no_grad():
        outs_t = tnet.cond_gen([0], list(x))
    outs_f = fnet.apply(variables, x_f, jnp.array([True, False]),
                        jax.random.key(0), "mopoe", 32, False,
                        method=fnet.cond_gen)
    for m in range(n_mod):
        _assert_close(outs_f[m], outs_t[m], atol=2e-4)

    # cond_gen, full given-set (powerset-within branch).
    calls["i"] = 0
    with torch.no_grad():
        outs_t = tnet.cond_gen([0, 1], list(x))
    outs_f = fnet.apply(variables, x_f, jnp.array([True, True]),
                        jax.random.key(0), "mopoe", 32, False,
                        method=fnet.cond_gen)
    for m in range(n_mod):
        _assert_close(outs_f[m], outs_t[m], atol=2e-4)


def test_mixture_forwards_and_losses_parity(monkeypatch):
    """Reference MMVAEPolyRes / MVPolyRes / MVTPolyRes forwards
    (mopoe_model.py:470-726) AND the trainer losses
    (train_psm_upd_mopoe_an.py:38-109) == MixtureMultimodalVAE's
    forward_mmvae/forward_mvae/forward_mvt + models.baselines.losses with
    identical injected reparametrization noise: (rec, kl) scalars match the
    reference loss functions run on the reference forwards."""
    import mopoe_model as ref
    import train_psm_upd_mopoe_an as ref_losses

    from score_based_multimodal_autoencoder_tpu.models.baselines import (
        losses as fl,
    )
    from score_based_multimodal_autoencoder_tpu.models.baselines.mixture import (
        MixtureMultimodalVAE,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_mixture_vaes,
    )

    enc = [(8, 16, 16, 2), (16, 32, 32, 2)]
    dec = [(32, 16, 16, 2), (16, 16, 16, 2)]
    n_mod, B, size_z = 2, 8, 16
    rng = np.random.RandomState(23)
    noise = [rng.randn(B, size_z).astype(np.float32) for _ in range(4)]
    x = torch.rand(n_mod, B, 3, 32, 32)
    x_f = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))

    # Noise scripts: reference consumes (B, z) draws per reparametrize call
    # in forward order; ours consumes stacked draws (see each branch).
    torch_calls = {"i": 0}

    def fake_torch_normal(mean=0, std=1, size=(), **k):
        out = torch.from_numpy(noise[torch_calls["i"]])
        torch_calls["i"] += 1
        return out

    jax_script = {"seq": [], "i": 0}

    def fake_jax_normal(key, shape=(), dtype=jnp.float32):
        out = jnp.asarray(jax_script["seq"][jax_script["i"]], dtype)
        jax_script["i"] += 1
        return out

    monkeypatch.setattr(torch, "normal", fake_torch_normal)
    monkeypatch.setattr(jax.random, "normal", fake_jax_normal)

    ind_stack = np.stack(noise[:2])  # (2, B, z)

    # ---- MMVAE: block-partitioned mixture + sum losses ------------------
    torch.manual_seed(31)
    tnet = ref.MMVAEPolyRes(n_mod, enc, dec, size_z=size_z, size_in=32,
                            img_ch=3).eval()
    variables = load_torch_mixture_vaes(tnet.state_dict(), n_mod, enc, dec,
                                        size_in=32, size_z=size_z)
    fnet = MixtureMultimodalVAE(
        n_mod, tuple(map(tuple, enc)), tuple(map(tuple, dec)),
        size_in=32, size_z=size_z, img_ch=3)

    torch_calls["i"] = 0
    with torch.no_grad():
        outs_t, mus_t, logvars_t = tnet(list(x))
        rec_t = ref_losses.total_rec_loss(outs_t, list(x))
        kl_t = ref_losses.total_kl_loss(mus_t, logvars_t)
    jax_script.update(seq=[ind_stack], i=0)
    outs_f, mus_f, logvars_f = fnet.apply(
        variables, x_f, jax.random.key(0), False, method=fnet.forward_mmvae)
    for m in range(n_mod):
        _assert_close(outs_f[m], outs_t[m], atol=2e-4)
    rec_f = fl.total_rec_loss(outs_f, x_f)
    kl_f = fl.total_kl_loss(mus_f, logvars_f)
    np.testing.assert_allclose(float(rec_f), float(rec_t), rtol=1e-4)
    np.testing.assert_allclose(float(kl_f), float(kl_t), rtol=1e-4)

    # ---- MVAE: subsampled ELBO terms + mvae_loss -------------------------
    torch.manual_seed(32)
    tnet = ref.MVPolyRes(n_mod, enc, dec, size_z=size_z, size_in=32,
                         img_ch=3).eval()
    variables = load_torch_mixture_vaes(tnet.state_dict(), n_mod, enc, dec,
                                        size_in=32, size_z=size_z)
    torch_calls["i"] = 0
    with torch.no_grad():
        elbo_t = tnet(list(x))
        rec_t, kl_t = ref_losses.mvae_loss(elbo_t, list(x))
    # our call order: individual (2,B,z), joint (B,z), k-subset (B,z);
    # with n_mod=2 the reference's k subset is deterministically [0, 1].
    jax_script.update(seq=[ind_stack, noise[2], noise[3]], i=0)
    elbo_f = fnet.apply(variables, x_f, jax.random.key(0), False,
                        method=fnet.forward_mvae)
    rec_f, kl_f = fl.mvae_loss(elbo_f, x_f)
    np.testing.assert_allclose(float(rec_f), float(rec_t), rtol=1e-4)
    np.testing.assert_allclose(float(kl_f), float(kl_t), rtol=1e-4)

    # ---- MVTCAE: CVIB loss ------------------------------------------------
    torch.manual_seed(33)
    tnet = ref.MVTPolyRes(n_mod, enc, dec, size_z=size_z, size_in=32,
                          img_ch=3).eval()
    variables = load_torch_mixture_vaes(tnet.state_dict(), n_mod, enc, dec,
                                        size_in=32, size_z=size_z)
    torch_calls["i"] = 0
    with torch.no_grad():
        elbo_t = tnet(list(x))
        rec_t, kl_t = ref_losses.mvt_loss(elbo_t, list(x))
    # reference draws ind0, ind1 (recons unused by mvt_loss), then the
    # joint z = noise[2]; ours draws the joint only.
    jax_script.update(seq=[noise[2]], i=0)
    elbo_f = fnet.apply(variables, x_f, jax.random.key(0), False,
                        method=fnet.forward_mvt)
    rec_f, kl_f = fl.mvt_loss(elbo_f, x_f)
    np.testing.assert_allclose(float(rec_f), float(rec_t), rtol=1e-4)
    np.testing.assert_allclose(float(kl_f), float(kl_t), rtol=1e-4)


def test_importance_time_bisection_parity(monkeypatch):
    """Reference sample_importance_weighted_time_for_likelihood
    (sde_helper2.py:138-150, host jnp bisection) == this repo's fused
    on-device bisection for the SAME quantiles."""
    import sde_helper2 as ref

    from score_based_multimodal_autoencoder_tpu.diffusion.losses import (
        sample_importance_weighted_time,
    )

    Z = float(ref.likelihood_importance_cum_weight(1.0, 0.1, 20.0))
    q = (np.linspace(0.05, 0.95, 7) * Z).astype(np.float32)
    want = np.asarray(ref.sample_importance_weighted_time_for_likelihood(
        7, 0.1, 20.0, quantile=q))
    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape=(), minval=0.0, maxval=1.0, **k: jnp.asarray(q))
    got = np.asarray(sample_importance_weighted_time(
        jax.random.key(0), 7, 0.1, 20.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mmplus_iwae_dreg_parity(monkeypatch):
    """Reference MMVAE+ K-sample estimators (train_cel_upd_mopoe_an.py:
    63-168: m_iwae value; m_dreg value AND its latent-cotangent hook, via
    input gradients) == this repo's mmplus_losses.m_iwae/m_dreg on the
    converted model with identical scripted Laplace draws. The DReG input
    gradient exercises the custom_vjp grad-scaling end to end (encoder <-
    hooked latents <- decoder/prior/posterior paths)."""
    import mmplus_model as ref
    import train_cel_upd_mopoe_an as ref_est

    from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus import (
        MMVAEPlus,
    )
    from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus_losses import (
        m_dreg,
        m_iwae,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_mmplus,
    )

    torch.manual_seed(37)
    params = types.SimpleNamespace(
        n_mod=2, latent_dim_w=4, latent_dim_z=4,
        learn_prior_w_polymnist=True, tmpdir="/tmp", variant="mmvaeplus",
        no_cuda=True, beta=1.0)
    tnet = ref.PolyMNIST_10modalities(params).eval()
    # Distinct per-modality w-priors: verifies the fresh w is drawn from
    # the DESTINATION modality's prior (mmplus_model.py:64).
    for vae in tnet.vaes:
        vae._pw_params[1].data = torch.randn(1, 4) * 0.3
    enc = [(64, 64, 64, 2), (64, 128, 128, 2), (128, 256, 256, 2)]
    dec = [(256, 128, 128, 2), (128, 128, 64, 2), (64, 64, 64, 2)]
    variables = load_torch_mmplus(tnet.state_dict(), 2, enc, dec,
                                  size_in=32, dim_u=8)
    fnet = MMVAEPlus(n_mod=2, latent_dim_w=4, latent_dim_z=4, arch="res")

    B, K = 4, 1
    rng = np.random.RandomState(29)
    # Scripted standard-Laplace draws, derived from the same uniforms on
    # both sides (x = loc - scale * sign(u) * log1p(-2|u|)).
    u_us = (rng.rand(K, 2, B, 8).astype(np.float32) - 0.5) * 0.98
    u_w = (rng.rand(2, 2, K, B, 4).astype(np.float32) - 0.5) * 0.98

    def _eps(u):
        return -np.sign(u) * np.log1p(-2 * np.abs(u))

    eps_us, eps_w = _eps(u_us), _eps(u_w)
    # torch draw order (MMVAE.forward, mmplus_model.py:50-77): posterior
    # rsample per modality, then one fresh prior-w per off-diagonal cell.
    tscript = [eps_us[:, 0], eps_us[:, 1],
               eps_w[0, 1][:, :, None, :], eps_w[1, 0][:, :, None, :]]
    tcall = {"i": 0}

    def fake_rsample(self, sample_shape=torch.Size()):
        e = torch.from_numpy(tscript[tcall["i"]])
        tcall["i"] += 1
        return self.loc + self.scale * e

    monkeypatch.setattr(torch.distributions.Laplace, "rsample", fake_rsample)

    jscript = [u_us, u_w]
    jcall = {"i": 0}

    def fake_uniform(key, shape=(), dtype=jnp.float32, minval=0.0,
                     maxval=1.0, **k):
        out = jnp.asarray(jscript[jcall["i"]], dtype)
        jcall["i"] += 1
        return out

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)

    x0 = torch.rand(B, 3, 32, 32)
    x1 = torch.rand(B, 3, 32, 32)
    x_f = jnp.asarray(np.stack([x0.numpy(), x1.numpy()])
                      .transpose(0, 1, 3, 4, 2))

    # IWAE value.
    tcall["i"] = 0
    with torch.no_grad():
        want = ref_est.m_iwae(tnet, [x0, x1], K=K)
    jcall["i"] = 0
    out = fnet.apply(variables, x_f, jax.random.key(0), K, False)
    got = m_iwae(out, x_f, beta=1.0, latent_dim_w=4)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)

    # DReG value + input gradient (the latent-cotangent hook).
    x0g = x0.clone().requires_grad_(True)
    x1g = x1.clone().requires_grad_(True)
    tcall["i"] = 0
    val_t = ref_est.m_dreg(tnet, [x0g, x1g], K=K)
    val_t.backward()
    grad_t = np.stack([x0g.grad.numpy(), x1g.grad.numpy()])

    def jloss(x_in):
        out = fnet.apply(variables, x_in, jax.random.key(0), K, False)

        def decode_fn(us, fresh_w):
            return fnet.apply(variables, us, fresh_w, False,
                              method=fnet.decode_matrix)

        return m_dreg(out, x_in, beta=1.0, latent_dim_w=4,
                      decode_fn=decode_fn)

    jcall["i"] = 0
    val_f, grad_f = jax.value_and_grad(jloss)(x_f)
    np.testing.assert_allclose(float(val_f), float(val_t.detach()),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grad_f).transpose(0, 1, 4, 2, 3), grad_t,
        rtol=1e-3, atol=2e-3)


def test_frechet_distance_parity():
    """Reference pytorch_fid calculate_frechet_distance (fid_score.py:
    176-230) == eval.frechet.frechet_distance on random moment pairs,
    including a singular-covariance case that trips the eps fallback."""
    from pytorch_fid.fid_score import calculate_frechet_distance

    from score_based_multimodal_autoencoder_tpu.eval.frechet import (
        frechet_distance,
    )

    rng = np.random.RandomState(31)
    d = 16
    for trial in range(3):
        a = rng.randn(d, 2 * d)
        b = rng.randn(d, 2 * d)
        mu1, mu2 = rng.randn(d), rng.randn(d)
        s1, s2 = a @ a.T / (2 * d), b @ b.T / (2 * d)
        want = calculate_frechet_distance(mu1, s1, mu2, s2)
        got = frechet_distance(mu1, s1, mu2, s2)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    # Singular covariances (rank-deficient) -> the eps-offset branch.
    a = rng.randn(d, 3)
    s_sing = a @ a.T
    want = calculate_frechet_distance(np.zeros(d), s_sing,
                                      np.ones(d), s_sing)
    got = frechet_distance(np.zeros(d), s_sing, np.ones(d), s_sing)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mmplus_cross_reconstruct_parity(monkeypatch):
    """Reference MMVAE.reconstruct_and_cross_reconstruct / cond_gen
    (mmplus_model.py:91-133: the EVAL path, whose off-diagonal fresh w
    comes from the FIXED pu's w-part with ONE draw per source row shared
    across destinations - unlike training's per-cell pw draws) == this
    repo's MMVAEPlus.cross_reconstruct/cond_gen with identical scripted
    Laplace draws and distinct learned pw (which must NOT be used here)."""
    import mmplus_model as ref

    from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus import (
        MMVAEPlus,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_mmplus,
    )

    torch.manual_seed(41)
    params = types.SimpleNamespace(
        n_mod=2, latent_dim_w=4, latent_dim_z=4,
        learn_prior_w_polymnist=True, tmpdir="/tmp", variant="mmvaeplus",
        no_cuda=True, beta=1.0)
    tnet = ref.PolyMNIST_10modalities(params).eval()
    # Distinct learned w-priors: the eval path must IGNORE them (it draws
    # from pu), so parity with scripted draws proves the pu routing.
    for vae in tnet.vaes:
        vae._pw_params[1].data = torch.randn(1, 4) * 0.3
    enc = [(64, 64, 64, 2), (64, 128, 128, 2), (128, 256, 256, 2)]
    dec = [(256, 128, 128, 2), (128, 128, 64, 2), (64, 64, 64, 2)]
    variables = load_torch_mmplus(tnet.state_dict(), 2, enc, dec,
                                  size_in=32, dim_u=8)
    fnet = MMVAEPlus(n_mod=2, latent_dim_w=4, latent_dim_z=4, arch="res")

    B = 3
    rng = np.random.RandomState(47)
    u_us = (rng.rand(2, B, 8).astype(np.float32) - 0.5) * 0.98
    u_w = (rng.rand(2, B, 8).astype(np.float32) - 0.5) * 0.98

    def _eps(u):
        return -np.sign(u) * np.log1p(-2 * np.abs(u))

    eps_us, eps_w = _eps(u_us), _eps(u_w)
    # torch draw order (reconstruct_and_cross_reconstruct_forw,
    # mmplus_model.py:103-124): posterior rsample(K=1) per modality, then
    # one pu rsample(Size([1, B])) per source row.
    tscript = [eps_us[0][None], eps_us[1][None],
               eps_w[0][None, :, None, :], eps_w[1][None, :, None, :]]
    tcall = {"i": 0}

    def fake_rsample(self, sample_shape=torch.Size()):
        e = torch.from_numpy(tscript[tcall["i"]])
        tcall["i"] += 1
        return self.loc + self.scale * e

    monkeypatch.setattr(torch.distributions.Laplace, "rsample", fake_rsample)

    jscript = [u_us, u_w]
    jcall = {"i": 0}

    def fake_uniform(key, shape=(), dtype=jnp.float32, minval=0.0,
                     maxval=1.0, **k):
        out = jnp.asarray(jscript[jcall["i"]], dtype)
        jcall["i"] += 1
        return out

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)

    x0 = torch.rand(B, 3, 32, 32)
    x1 = torch.rand(B, 3, 32, 32)
    x_f = jnp.asarray(np.stack([x0.numpy(), x1.numpy()])
                      .transpose(0, 1, 3, 4, 2))

    tcall["i"] = 0
    recons_t = tnet.reconstruct_and_cross_reconstruct([x0, x1])
    jcall["i"] = 0
    recons_f = fnet.apply(variables, x_f, jax.random.key(0), False,
                          method=fnet.cross_reconstruct)
    for e in range(2):
        for d in range(2):
            _assert_close(recons_f[e, d], recons_t[e][d][0], atol=2e-4)

    # cond_gen given modality 0 == source row 0 of the eval matrix.
    tcall["i"] = 0
    outs_t = tnet.cond_gen([0], [x0, x1])
    jcall["i"] = 0
    outs_f = fnet.apply(variables, x_f, [0], jax.random.key(0), False,
                        method=fnet.cond_gen)
    for d in range(2):
        _assert_close(outs_f[d], outs_t[d], atol=2e-4)


def test_mmplus_het_iwae_dreg_parity(monkeypatch):
    """Reference MMPLUSCeleba (mmplus_model_cel.py:473-519; heterogeneous
    image/mask/attr nets :197-471, BERNOULLI attr likelihood :407-411) with
    the generic estimators (train_cel_upd_mopoe_an.py:63-168) == this
    repo's HeterogeneousMMVAEPlus + m_iwae_het/m_dreg_het after
    load_torch_mmplus_het, with scripted Laplace draws per cross-matrix
    cell and DISTINCT per-modality learned w-priors."""
    import mmplus_model_cel as ref
    import train_cel_upd_mopoe_an as ref_est

    from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus_het import (
        HeterogeneousMMVAEPlus,
        m_dreg_het,
        m_iwae_het,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_mmplus_het,
    )
    from score_based_multimodal_autoencoder_tpu.models.vae import (
        AttributeVAE,
        celeba_image_vae,
        celeba_mask_vae,
    )

    torch.manual_seed(41)
    params = types.SimpleNamespace(
        n_mod=3, latent_dim_w=4, latent_dim_z=4,
        learn_prior_w_polymnist=True, tmpdir="/tmp", variant="mmvaeplus",
        no_cuda=True, beta=1.0)
    tnet = ref.MMPLUSCeleba(params).eval()
    for vae in tnet.vaes:
        vae._pw_params[1].data = torch.randn(1, 4) * 0.3

    img_enc = [(64, 128, 128, 2), (128, 256, 256, 2), (256, 512, 512, 2)]
    img_dec = [(512, 512, 256, 2), (256, 256, 128, 2), (128, 128, 64, 2)]
    mask_enc = [(64, 128, 128, 4), (128, 256, 256, 4)]
    mask_dec = [(256, 256, 128, 4), (128, 128, 64, 4)]
    variables = load_torch_mmplus_het(tnet.state_dict(), img_enc, img_dec,
                                      mask_enc, mask_dec, size_in=128)
    fnet = HeterogeneousMMVAEPlus(
        modality_modules=(celeba_image_vae(8, size_in=128),
                          celeba_mask_vae(8, size_in=128),
                          AttributeVAE(size_z=8, att_size=18)),
        latent_dim_w=4, latent_dim_z=4)

    B, K = 2, 1
    rng = np.random.RandomState(43)
    u_us = (rng.rand(K, 3, B, 8).astype(np.float32) - 0.5) * 0.98
    u_w = (rng.rand(3, 3, K, B, 4).astype(np.float32) - 0.5) * 0.98

    def _eps(u):
        return -np.sign(u) * np.log1p(-2 * np.abs(u))

    eps_us, eps_w = _eps(u_us), _eps(u_w)
    # torch order: 3 posterior rsamples, then one fresh-w per off-diagonal
    # cell in (src, dst) loop order.
    tscript = [eps_us[:, 0], eps_us[:, 1], eps_us[:, 2]]
    for e in range(3):
        for d in range(3):
            if d != e:
                tscript.append(eps_w[e, d][:, :, None, :])
    tcall = {"i": 0}

    def fake_rsample(self, sample_shape=torch.Size()):
        e = torch.from_numpy(tscript[tcall["i"]])
        tcall["i"] += 1
        return self.loc + self.scale * e

    monkeypatch.setattr(torch.distributions.Laplace, "rsample", fake_rsample)

    jscript = [u_us, u_w]
    jcall = {"i": 0}

    def fake_uniform(key, shape=(), dtype=jnp.float32, minval=0.0,
                     maxval=1.0, **k):
        out = jnp.asarray(jscript[jcall["i"]], dtype)
        jcall["i"] += 1
        return out

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)

    img = torch.rand(B, 3, 128, 128)
    mask = torch.rand(B, 1, 128, 128)
    attr = (torch.rand(B, 18) > 0.5).float()
    x_t = [img, mask, attr]
    x_f = [jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
           jnp.asarray(mask.numpy().transpose(0, 2, 3, 1)),
           jnp.asarray(attr.numpy())]

    tcall["i"] = 0
    with torch.no_grad():
        want_iwae = ref_est.m_iwae(tnet, x_t, K=K)
        tcall["i"] = 0
        want_dreg = ref_est.m_dreg(tnet, x_t, K=K)

    jcall["i"] = 0
    out = fnet.apply(variables, x_f, jax.random.key(0), K, False)
    got_iwae = m_iwae_het(out, x_f, beta=1.0, latent_dim_w=4)
    np.testing.assert_allclose(float(got_iwae), float(want_iwae), rtol=1e-4)

    got_dreg = m_dreg_het(fnet, variables, out, x_f, beta=1.0,
                          latent_dim_w=4, train=False)
    np.testing.assert_allclose(float(got_dreg), float(want_dreg.detach()),
                               rtol=1e-4)


def test_mmplus_het_two_modality_convert():
    """The reference's 2-modality MMPLUSCeleba variant (img, att -
    mmplus_model_cel.py:481-483: vaes.1 IS the attribute VAE) converts
    with n_mod=2: modules map to (image, attr), per-modality pw rows
    stack, and the attr encoder round-trips."""
    import mmplus_model_cel as ref

    from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus_het import (
        HeterogeneousMMVAEPlus,
    )
    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_mmplus_het,
    )
    from score_based_multimodal_autoencoder_tpu.models.vae import (
        AttributeVAE,
        celeba_image_vae,
    )

    torch.manual_seed(43)
    params = types.SimpleNamespace(
        n_mod=2, latent_dim_w=4, latent_dim_z=4,
        learn_prior_w_polymnist=True, tmpdir="/tmp", variant="mmvaeplus",
        no_cuda=True, beta=1.0)
    tnet = ref.MMPLUSCeleba(params).eval()
    for vae in tnet.vaes:
        vae._pw_params[1].data = torch.randn(1, 4) * 0.3

    img_enc = [(64, 128, 128, 2), (128, 256, 256, 2), (256, 512, 512, 2)]
    img_dec = [(512, 512, 256, 2), (256, 256, 128, 2), (128, 128, 64, 2)]
    mask_enc = [(64, 128, 128, 4), (128, 256, 256, 4)]
    mask_dec = [(256, 256, 128, 4), (128, 128, 64, 4)]
    variables = load_torch_mmplus_het(tnet.state_dict(), img_enc, img_dec,
                                      mask_enc, mask_dec, size_in=128,
                                      n_mod=2)
    assert set(variables["params"]) == {
        "modality_modules_0", "modality_modules_1", "pw_raw"}
    assert variables["params"]["pw_raw"].shape == (2, 4)
    for m in range(2):
        np.testing.assert_allclose(
            np.asarray(variables["params"]["pw_raw"][m]),
            tnet.vaes[m]._pw_params[1].detach().numpy()[0])

    fnet = HeterogeneousMMVAEPlus(
        modality_modules=(celeba_image_vae(8, size_in=128),
                          AttributeVAE(size_z=8, att_size=18)),
        latent_dim_w=4, latent_dim_z=4)
    B = 2
    img = torch.rand(B, 3, 128, 128)
    attr = (torch.rand(B, 18) > 0.5).float()
    x_f = [jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
           jnp.asarray(attr.numpy())]
    q_loc_f, q_scale_f = fnet.apply(variables, x_f, False,
                                    method=fnet.encode)
    with torch.no_grad():
        loc_t, _ = tnet.vaes[1].enc(attr)
    np.testing.assert_allclose(np.asarray(q_loc_f[1]), loc_t.numpy(),
                               rtol=1e-4, atol=1e-5)

    # ValueError on layouts the reference never shipped.
    with pytest.raises(ValueError):
        load_torch_mmplus_het(tnet.state_dict(), img_enc, img_dec,
                              mask_enc, mask_dec, size_in=128, n_mod=4)


def test_het_rec_loss_parity():
    """Reference CelebA recon loss (train_cel_upd_mopoe_an.py:177-196:
    sum-MSE per image modality + BCE-with-logits for the LAST/attr
    modality) == cli.train_baseline._het_rec_loss on random tensors."""
    import train_cel_upd_mopoe_an as ref

    from score_based_multimodal_autoencoder_tpu.cli.train_baseline import (
        _het_rec_loss,
    )

    rng = np.random.RandomState(47)
    B = 4
    outs_t = [torch.from_numpy(rng.rand(B, 3, 8, 8).astype(np.float32)),
              torch.from_numpy(rng.rand(B, 1, 8, 8).astype(np.float32)),
              torch.from_numpy(rng.randn(B, 18).astype(np.float32))]
    ins_t = [torch.from_numpy(rng.rand(B, 3, 8, 8).astype(np.float32)),
             torch.from_numpy(rng.rand(B, 1, 8, 8).astype(np.float32)),
             torch.from_numpy((rng.rand(B, 18) > 0.5)
                              .astype(np.float32))]
    want = ref.total_rec_loss(outs_t, ins_t)
    outs_f = [jnp.asarray(o.numpy().transpose(0, 2, 3, 1))
              if o.ndim == 4 else jnp.asarray(o.numpy()) for o in outs_t]
    ins_f = [jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
             if x.ndim == 4 else jnp.asarray(x.numpy()) for x in ins_t]
    got = _het_rec_loss(outs_f, ins_f)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_hvae_parity(monkeypatch):
    """Reference hierarchical HVAE (h_vae_model.py:279-331; RBlock/TBlock
    :7-97) == models.hvae.HVAE after load_torch_hvae, with identical
    injected reparametrization noise at the top level and at every decoder
    level: reconstruction, (mu, logvar) and the per-level KLs all match."""
    import h_vae_model as ref

    from score_based_multimodal_autoencoder_tpu.models.convert import (
        load_torch_hvae,
    )
    from score_based_multimodal_autoencoder_tpu.models.hvae import HVAE

    torch.manual_seed(51)
    enc = [(16, 16, 16, 2), (16, 16, 32, 2)]
    # TBlock requires in_width == middle_width (x + pr_out,
    # h_vae_model.py:82).
    dec = [(32, 32, 16, 2), (16, 16, 16, 2)]
    res_inp = [0, 1]
    B, size_in, size_z = 2, 16, 8
    tnet = ref.HVAE(enc, dec, res_inp, size_in, size_z).eval()
    variables = load_torch_hvae(tnet.state_dict(), enc, dec, size_in, size_z)

    fnet = HVAE(tuple(map(tuple, enc)), tuple(map(tuple, dec)),
                tuple(res_inp), size_in=size_in, size_z=size_z)

    rng = np.random.RandomState(53)
    noise_nchw = [rng.randn(B, size_z).astype(np.float32),
                  rng.randn(B, 32, 4, 4).astype(np.float32),
                  rng.randn(B, 16, 8, 8).astype(np.float32)]
    tcall = {"i": 0}

    def fake_torch_normal(mean=0, std=1, size=(), **k):
        out = torch.from_numpy(noise_nchw[tcall["i"]])
        tcall["i"] += 1
        return out

    jscript = [noise_nchw[0],
               noise_nchw[1].transpose(0, 2, 3, 1),
               noise_nchw[2].transpose(0, 2, 3, 1)]
    jcall = {"i": 0}

    def fake_jax_normal(key, shape=(), dtype=jnp.float32):
        out = jnp.asarray(jscript[jcall["i"]], dtype)
        jcall["i"] += 1
        return out

    monkeypatch.setattr(torch, "normal", fake_torch_normal)
    monkeypatch.setattr(jax.random, "normal", fake_jax_normal)

    x = torch.rand(B, 3, size_in, size_in)
    with torch.no_grad():
        out_t, mu_t, lv_t, kls_t = tnet(x, train=True)
    out_f, mu_f, lv_f, kls_f = fnet.apply(
        variables, _nhwc(x), jax.random.key(0), True)

    np.testing.assert_allclose(np.asarray(mu_f), mu_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv_f), lv_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(kls_f), np.array([float(k) for k in kls_t]),
        rtol=1e-3, atol=1e-4)
    _assert_close(out_f, out_t, atol=2e-4)


def test_convert_cli_baseline_checkpoints(tmp_path):
    """cli.convert --arch mixture / mmplus turns torch.save'd reference
    baseline checkpoints into orbax checkpoints that load straight into the
    flax baselines (the cli.evaluate --baseline layout)."""
    import mmplus_model as mref
    import mopoe_model as ref

    from score_based_multimodal_autoencoder_tpu.cli import convert
    from score_based_multimodal_autoencoder_tpu.models.baselines.mixture import (
        MixtureMultimodalVAE,
    )
    from score_based_multimodal_autoencoder_tpu.models.baselines.mmplus import (
        MMVAEPlus,
    )
    from score_based_multimodal_autoencoder_tpu.models.vae import (
        POLYMNIST_DEC_CHANNELS,
        POLYMNIST_ENC_CHANNELS,
    )
    from score_based_multimodal_autoencoder_tpu.train.checkpoints import (
        CheckpointManager,
    )

    torch.manual_seed(57)
    enc = [list(c) for c in POLYMNIST_ENC_CHANNELS]
    dec = [list(c) for c in POLYMNIST_DEC_CHANNELS]
    tnet = ref.MOPOEPolyRes(2, enc, dec, size_z=64, size_in=32,
                            img_ch=3).eval()
    torch.save({"model_state_dict": tnet.state_dict()},
               tmp_path / "mopoe.pt")
    convert.main(["--arch", "mixture", "--n-mod", "2",
                  "--torch-ckpt", str(tmp_path / "mopoe.pt"),
                  "--out", str(tmp_path / "mopoe")])
    ckpt = CheckpointManager(str(tmp_path / "mopoe")).restore_raw("last")
    fnet = MixtureMultimodalVAE(
        2, POLYMNIST_ENC_CHANNELS, POLYMNIST_DEC_CHANNELS,
        size_in=32, size_z=64, img_ch=3)
    x = torch.rand(2, 2, 3, 32, 32)
    x_f = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))
    mus_f, _ = fnet.apply(
        {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]},
        x_f, False, method=fnet.encode_all)
    with torch.no_grad():
        mu0_t, _ = tnet.vae_list[0].encoder(x[0])
    np.testing.assert_allclose(np.asarray(mus_f[0]), mu0_t.numpy(),
                               rtol=1e-3, atol=1e-4)

    params = types.SimpleNamespace(n_mod=2, latent_dim_w=4, latent_dim_z=4,
                                   learn_prior_w_polymnist=True,
                                   tmpdir="/tmp")
    mnet = mref.PolyMNIST_10modalities(params).eval()
    torch.save(mnet.state_dict(), tmp_path / "mmplus.pt")
    convert.main(["--arch", "mmplus", "--n-mod", "2", "--latent-dim-w", "4",
                  "--latent-dim-z", "4",
                  "--torch-ckpt", str(tmp_path / "mmplus.pt"),
                  "--out", str(tmp_path / "mmplus")])
    mck = CheckpointManager(str(tmp_path / "mmplus")).restore_raw("last")
    fm = MMVAEPlus(n_mod=2, latent_dim_w=4, latent_dim_z=4, arch="res")
    loc_f, _ = fm.apply(
        {"params": mck["params"], "batch_stats": mck["batch_stats"]},
        x_f, False, method=fm.encode)
    with torch.no_grad():
        loc_t, _ = mnet.vaes[0].enc(x[0])
    np.testing.assert_allclose(np.asarray(loc_f[0]), loc_t.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_norunet_parity():
    """Reference NorUnet (unet_model.py:697-728: time-embedding-free UNet,
    output divided by sigma - the NCSN net the annealed-Langevin AE track
    consumes) == SigmaNormalizedUNet with the unet subtree converted via
    load_torch_unet."""
    import unet_model

    from score_based_multimodal_autoencoder_tpu.nn.cross_attention import (
        SigmaNormalizedUNet,
    )

    torch.manual_seed(61)
    tnet = unet_model.NorUnet(n_mod=2, z_dim=64, dim=12, dim2=8,
                              channels=2, dim_mults=(1, 2)).eval()
    sub = {k[len("unet."):]: v for k, v in tnet.state_dict().items()
           if k.startswith("unet.")}
    unet_params = load_torch_unet(sub, 2)
    fnet = SigmaNormalizedUNet(dim=12, channels=2, dim_mults=(1, 2))

    x = torch.randn(2, 2, 8, 8)
    sigma = torch.tensor([0.7, 2.5]).view(2, 1, 1, 1)
    with torch.no_grad():
        want = tnet(x, sigma)
    got = fnet.apply({"params": {"unet": unet_params}}, _nhwc(x),
                     jnp.asarray([0.7, 2.5], jnp.float32))
    _assert_close(got, want)
