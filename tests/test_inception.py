"""InceptionV3 port: numeric parity against the torch FID architecture with
identical (random) weights - validates the port without the weights file."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.eval.inception import (
    FIDInceptionV3,
    load_torch_weights,
)

torch = pytest.importorskip("torch")


def _torch_fid_inception():
    """fid_inception_v3 minus the weight download
    (/root/reference/pytorch_fid/inception.py:184-210 reconstructed with
    torchvision building blocks and random init)."""
    torchvision = pytest.importorskip("torchvision")
    if getattr(torchvision, "__sbmae_stub__", False) or not hasattr(
            torchvision.models, "inception"):
        # test_torch_parity installs a minimal torchvision stub into
        # sys.modules (needed to import the reference's h_vae_model_copy);
        # it satisfies importorskip but carries no real models - skip
        # exactly as when torchvision is absent.
        pytest.skip("torchvision is a test stub without real models")
    tv = torchvision.models.inception
    inception = torchvision.models.inception_v3(
        num_classes=1008, aux_logits=False, init_weights=False)

    class FIDInceptionA(tv.InceptionA):
        def forward(self, x):
            branch1x1 = self.branch1x1(x)
            branch5x5 = self.branch5x5_2(self.branch5x5_1(x))
            b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = torch.nn.functional.avg_pool2d(
                x, kernel_size=3, stride=1, padding=1, count_include_pad=False)
            bp = self.branch_pool(bp)
            return torch.cat([branch1x1, branch5x5, b3, bp], 1)

    class FIDInceptionC(tv.InceptionC):
        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            bp = torch.nn.functional.avg_pool2d(
                x, kernel_size=3, stride=1, padding=1, count_include_pad=False)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b7, bd, bp], 1)

    class FIDInceptionE1(tv.InceptionE):
        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            bp = torch.nn.functional.avg_pool2d(
                x, kernel_size=3, stride=1, padding=1, count_include_pad=False)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b3, bd, bp], 1)

    class FIDInceptionE2(tv.InceptionE):
        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            bp = torch.nn.functional.max_pool2d(x, kernel_size=3, stride=1, padding=1)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b3, bd, bp], 1)

    inception.Mixed_5b = FIDInceptionA(192, pool_features=32)
    inception.Mixed_5c = FIDInceptionA(256, pool_features=64)
    inception.Mixed_5d = FIDInceptionA(288, pool_features=64)
    inception.Mixed_6b = FIDInceptionC(768, channels_7x7=128)
    inception.Mixed_6c = FIDInceptionC(768, channels_7x7=160)
    inception.Mixed_6d = FIDInceptionC(768, channels_7x7=160)
    inception.Mixed_6e = FIDInceptionC(768, channels_7x7=192)
    inception.Mixed_7b = FIDInceptionE1(1280)
    inception.Mixed_7c = FIDInceptionE2(2048)
    inception.eval()
    return inception


def test_basicconv_parity_with_torch():
    """Conv+BN+ReLU stem unit vs raw torch (no torchvision needed)."""
    from score_based_multimodal_autoencoder_tpu.eval.inception import BasicConv

    torch.manual_seed(1)
    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, bias=False)
    tbn = torch.nn.BatchNorm2d(8, eps=1e-3).eval()
    with torch.no_grad():
        tbn.running_mean.uniform_(-0.2, 0.2)
        tbn.running_var.uniform_(0.7, 1.3)
        tbn.weight.uniform_(0.5, 1.5)
        tbn.bias.uniform_(-0.3, 0.3)

    x = np.random.default_rng(2).normal(size=(2, 11, 11, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch.relu(tbn(tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))))

    m = BasicConv(8, (3, 3), strides=(2, 2))
    variables = m.init(jax.random.key(0), jnp.asarray(x))
    variables = {
        "params": {
            "conv": {"kernel": jnp.asarray(
                tconv.weight.detach().numpy().transpose(2, 3, 1, 0))},
            "bn": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        },
        "batch_stats": {
            "bn": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                   "var": jnp.asarray(tbn.running_var.numpy())},
        },
    }
    out = m.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_inception_parity_with_torch_random_weights():
    torch.manual_seed(0)
    tmodel = _torch_fid_inception()
    # Randomize BN running stats too, so the parity test exercises them.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.3)

    model = FIDInceptionV3(resize_input=False, normalize_input=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    variables = load_torch_weights(variables, tmodel.state_dict())

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 299, 299, 3)).astype(np.float32)

    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2)) * 2 - 1
        h = tx
        h = tmodel.Conv2d_1a_3x3(h)
        h = tmodel.Conv2d_2a_3x3(h)
        h = tmodel.Conv2d_2b_3x3(h)
        h = torch.nn.functional.max_pool2d(h, 3, 2)
        h = tmodel.Conv2d_3b_1x1(h)
        h = tmodel.Conv2d_4a_3x3(h)
        h = torch.nn.functional.max_pool2d(h, 3, 2)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"]:
            h = getattr(tmodel, name)(h)
        tfeat = torch.nn.functional.adaptive_avg_pool2d(h, (1, 1)).squeeze(-1).squeeze(-1)

    jfeat = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(jfeat), tfeat.numpy(), rtol=2e-2, atol=2e-4)


def test_inception_output_shape():
    model = FIDInceptionV3(resize_input=True)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 2048)


def test_load_torch_weights_synthetic_state_dict():
    """Exercise the weight converter WITHOUT torchvision: synthesize a
    state_dict with torchvision's key layout (OIHW conv kernels, bn
    weight/bias/running_mean/running_var) shaped from the flax tree, and
    assert the conversion round-trips and changes the features
    (VERDICT r1 weak #7; converter /root/reference/pytorch_fid/inception.py
    key surface)."""
    model = FIDInceptionV3(resize_input=False, normalize_input=False)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))

    rng = np.random.default_rng(3)

    def paths(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "conv" in v and "bn" in v:
                    yield prefix + (k,)
                else:
                    yield from paths(v, prefix + (k,))

    state_dict = {}
    for path in paths(variables["params"]):
        name = ".".join(path)
        node = variables["params"]
        for p in path:
            node = node[p]
        kh, kw, cin, cout = node["conv"]["kernel"].shape
        state_dict[f"{name}.conv.weight"] = rng.normal(
            size=(cout, cin, kh, kw)).astype(np.float32) * 0.05
        state_dict[f"{name}.bn.weight"] = rng.uniform(
            0.5, 1.5, size=(cout,)).astype(np.float32)
        state_dict[f"{name}.bn.bias"] = rng.uniform(
            -0.3, 0.3, size=(cout,)).astype(np.float32)
        state_dict[f"{name}.bn.running_mean"] = rng.uniform(
            -0.2, 0.2, size=(cout,)).astype(np.float32)
        state_dict[f"{name}.bn.running_var"] = rng.uniform(
            0.7, 1.3, size=(cout,)).astype(np.float32)

    loaded = load_torch_weights(variables, state_dict)

    # Round-trip: every converted tensor equals the synthetic source.
    w = state_dict["Conv2d_1a_3x3.conv.weight"]
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["Conv2d_1a_3x3"]["conv"]["kernel"]),
        w.transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(loaded["batch_stats"]["Mixed_7c"]["branch_pool"]["bn"]["var"]),
        state_dict["Mixed_7c.branch_pool.bn.running_var"])
    # Every BasicConv was visited (no silently-skipped branches).
    n_paths = sum(1 for _ in paths(variables["params"]))
    assert n_paths * 5 == len(state_dict)

    # Features actually change vs the random init.
    x = jnp.asarray(rng.uniform(size=(2, 75, 75, 3)).astype(np.float32))
    f0 = model.apply(variables, x)
    f1 = model.apply(loaded, x)
    assert f1.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(f1)))
    assert float(jnp.abs(f0 - f1).max()) > 1e-3
