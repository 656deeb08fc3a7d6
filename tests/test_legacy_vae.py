"""Legacy conv-VAE zoo (polymnist_model.py:20-798, h_vae_model.py:341-505)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_based_multimodal_autoencoder_tpu.models.legacy_vae import (
    PRESETS,
    make_legacy_vae,
)


@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_preset_round_trip(preset):
    model = make_legacy_vae(preset)
    # shrink the 128x128 CelebA preset, but keep enough resolution for its
    # five stride-2 layers
    size = 2 ** len(model.channels) if model.size_in == 128 else model.size_in
    model = make_legacy_vae(preset, size_in=size)
    x = jax.random.uniform(jax.random.key(0), (2, size, size, model.img_ch))
    if model.deterministic:
        variables = model.init(jax.random.key(1), x)
        out, z = model.apply(variables, x)
        assert z.shape == (2, model.size_z)
    else:
        variables = model.init(jax.random.key(1), x, jax.random.key(2))
        out, mu, logvar = model.apply(variables, x, jax.random.key(3))
        assert mu.shape == logvar.shape == (2, model.size_z)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    if model.sigmoid_out:
        assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_sample_and_key_determinism():
    model = make_legacy_vae("pmvae2")
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    variables = model.init(jax.random.key(1), x, jax.random.key(2))
    s = model.apply(variables, jax.random.key(5), 4, method=model.sample)
    assert s.shape == (4, 32, 32, 3)
    a = model.apply(variables, x, jax.random.key(7))[0]
    b = model.apply(variables, x, jax.random.key(7))[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
