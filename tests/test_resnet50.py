"""Flax ResNet-50 (Res50CLF backbone) tests: shapes, converter round-trip,
and numerical parity against a functional torch re-execution of the
torchvision resnet50 graph (h_vae_model_copy.py:237-251)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.models.resnet50 import (
    _STAGES,
    Res50Classifier,
    ResNet50Features,
    load_torch_resnet50,
)


def _synthetic_state_dict(seed=0, head=False):
    """torchvision-format resnet50 state_dict with small random values."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(
            np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.uniform(-0.1, 0.1, c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.uniform(-0.1, 0.1, c).astype(
            np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 3, 64, 7)
    bn("bn1", 64)
    cin = 64
    for s, (width, blocks, _) in enumerate(_STAGES, start=1):
        out = width * 4
        for b in range(blocks):
            t = f"layer{s}.{b}"
            conv(f"{t}.conv1", cin if b == 0 else out, width, 1)
            bn(f"{t}.bn1", width)
            conv(f"{t}.conv2", width, width, 3)
            bn(f"{t}.bn2", width)
            conv(f"{t}.conv3", width, out, 1)
            bn(f"{t}.bn3", out)
            if b == 0:
                conv(f"{t}.downsample.0", cin, out, 1)
                bn(f"{t}.downsample.1", out)
        cin = out
    if head:
        sd["clf_net.weight"] = rng.normal(0, 0.05, (18, 2048)).astype(
            np.float32)
        sd["clf_net.bias"] = np.zeros(18, np.float32)
    return sd


def test_res50_classifier_shapes():
    clf = Res50Classifier(size_out=18)
    x = jnp.zeros((2, 64, 64, 3))
    variables = clf.init(jax.random.key(0), x)
    out = clf.apply(variables, x)
    assert out.shape == (2, 18)


def test_converter_round_trip_and_effect():
    clf = Res50Classifier(size_out=18)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    variables = clf.init(jax.random.key(1), x)
    sd = _synthetic_state_dict(head=True)
    loaded = load_torch_resnet50(variables, sd, head_key="clf_net")
    # Round-trip: OIHW -> HWIO of the stem conv.
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["res50"]["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(loaded["batch_stats"]["res50"]["layer4_2"]["bn3"]["var"]),
        sd["layer4.2.bn3.running_var"])
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["clf_net"]["kernel"]),
        sd["clf_net.weight"].T)
    out_a = clf.apply(variables, x)
    out_b = clf.apply(loaded, x)
    assert np.abs(np.asarray(out_a - out_b)).max() > 1e-4


def _torch_resnet50_forward(sd, x_nchw):
    """Re-execute the torchvision resnet50 feature graph functionally."""
    torch = pytest.importorskip("torch")
    F = torch.nn.functional

    def t(name):
        return torch.from_numpy(np.asarray(sd[name]))

    def bnorm(h, name):
        return F.batch_norm(h, t(f"{name}.running_mean"),
                            t(f"{name}.running_var"), t(f"{name}.weight"),
                            t(f"{name}.bias"), training=False, eps=1e-5)

    h = torch.from_numpy(x_nchw)
    h = F.conv2d(h, t("conv1.weight"), stride=2, padding=3)
    h = F.relu(bnorm(h, "bn1"))
    h = F.max_pool2d(h, 3, stride=2, padding=1)
    for s, (_, blocks, stride) in enumerate(_STAGES, start=1):
        for b in range(blocks):
            n = f"layer{s}.{b}"
            st = stride if b == 0 else 1
            idt = h
            o = F.relu(bnorm(F.conv2d(h, t(f"{n}.conv1.weight")), f"{n}.bn1"))
            o = F.relu(bnorm(F.conv2d(o, t(f"{n}.conv2.weight"), stride=st,
                                      padding=1), f"{n}.bn2"))
            o = bnorm(F.conv2d(o, t(f"{n}.conv3.weight")), f"{n}.bn3")
            if b == 0:
                idt = bnorm(F.conv2d(h, t(f"{n}.downsample.0.weight"),
                                     stride=st), f"{n}.downsample.1")
            h = F.relu(o + idt)
    return h.mean(dim=(2, 3)).numpy()


def test_parity_with_functional_torch():
    """The flax graph must reproduce torchvision's resnet50 numerics."""
    sd = _synthetic_state_dict()
    x = np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    feats = ResNet50Features()
    variables = feats.init(jax.random.key(0), jnp.asarray(x))
    loaded = load_torch_resnet50(variables, sd)
    ours = np.asarray(feats.apply(loaded, jnp.asarray(x)))
    ref = _torch_resnet50_forward(sd, x.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)
