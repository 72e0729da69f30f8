"""Models + materials tests: encodings, MLPs, explicit material."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tssplat_tpu.models.networks import (get_activation, get_encoding,
                                         get_mlp, hash_grid_encoding,
                                         frequency_encoding, sphere_init_mlp,
                                         create_network_with_input_encoding)
from tssplat_tpu.materials import ExplicitMaterial, contract_to_unisphere


def test_activations():
    x = jnp.linspace(-2, 2, 11)
    assert np.allclose(get_activation("none")(x), x)
    assert np.all(get_activation("sigmoid")(x) > 0)
    s = get_activation("lin2srgb")(jnp.asarray([0.0, 0.5, 1.0]))
    assert float(s[0]) == 0.0 and float(s[2]) == pytest.approx(1.0, abs=1e-5)
    assert np.allclose(get_activation("scale_-11_01")(x), x * 0.5 + 0.5)


def test_hash_grid_shapes_and_grads(rng):
    enc = hash_grid_encoding(n_levels=4, log2_hashmap_size=10,
                             base_resolution=4, per_level_scale=2.0)
    params = enc.init_fn(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(0, 1, size=(17, 3)), jnp.float32)
    y = enc.apply_fn(params, x)
    assert y.shape == (17, 8)

    def f(p):
        return jnp.sum(enc.apply_fn(p, x) ** 2)
    g = jax.grad(f)(params)
    assert float(jnp.abs(g["table"]).max()) > 0


def test_hash_grid_trilinear_continuity():
    """Encoding must be continuous across cell boundaries (trilinear)."""
    enc = hash_grid_encoding(n_levels=2, log2_hashmap_size=8,
                             base_resolution=4, per_level_scale=2.0)
    params = enc.init_fn(jax.random.PRNGKey(1))
    eps = 1e-5
    a = enc.apply_fn(params, jnp.asarray([[0.25 - eps, 0.3, 0.7]]))
    b = enc.apply_fn(params, jnp.asarray([[0.25 + eps, 0.3, 0.7]]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_frequency_progressive_masking():
    enc = frequency_encoding(3, n_frequencies=4, n_masking_step=100)
    x = jnp.asarray([[0.1, 0.2, 0.3]])
    early = np.asarray(enc.apply_fn({}, x, step=0))
    late = np.asarray(enc.apply_fn({}, x, step=100))
    # at step 0 everything above band 0 is masked
    assert np.abs(early).sum() < np.abs(late).sum()
    assert np.abs(late).sum() > 0


def test_mlp_and_sphere_init():
    mlp = get_mlp(8, 3, {"otype": "VanillaMLP", "n_neurons": 16,
                         "n_hidden_layers": 2,
                         "output_activation": "sigmoid"})
    p = mlp.init_fn(jax.random.PRNGKey(0))
    y = mlp.apply_fn(p, jnp.ones((5, 8)))
    assert y.shape == (5, 3) and np.all((np.asarray(y) >= 0) & (np.asarray(y) <= 1))

    sdf = sphere_init_mlp(3, 1, n_neurons=64, n_hidden_layers=2,
                          sphere_radius=0.5)
    p = sdf.init_fn(jax.random.PRNGKey(0))
    inside = float(sdf.apply_fn(p, jnp.zeros((1, 3)))[0, 0])
    outside = float(sdf.apply_fn(p, jnp.asarray([[1.5, 0.0, 0.0]]))[0, 0])
    assert inside < 0 < outside


def test_composite_encoding_includes_xyz():
    enc = get_encoding(3, {"otype": "HashGrid", "n_levels": 2,
                           "log2_hashmap_size": 8, "base_resolution": 4,
                           "per_level_scale": 2.0, "include_xyz": True})
    params = enc.init_fn(jax.random.PRNGKey(0))
    y = enc.apply_fn(params, jnp.full((2, 3), 0.5))
    assert y.shape == (2, 3 + 4)
    np.testing.assert_allclose(np.asarray(y[:, :3]), 0.0, atol=1e-6)  # 0.5*2-1


def test_network_with_input_encoding():
    net = create_network_with_input_encoding(
        3, 2, {"otype": "Frequency", "n_frequencies": 4},
        {"otype": "VanillaMLP", "n_neurons": 16, "n_hidden_layers": 1})
    p = net.init_fn(jax.random.PRNGKey(0))
    assert net.apply_fn(p, jnp.ones((7, 3))).shape == (7, 2)


def test_contract_to_unisphere():
    bbox = np.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    x = contract_to_unisphere(jnp.asarray([[-1.0, 0.0, 1.0]]), bbox)
    np.testing.assert_allclose(np.asarray(x), [[0.0, 0.5, 1.0]], atol=1e-6)
    # unbounded: far points contract into [0,1]
    far = contract_to_unisphere(jnp.asarray([[50.0, 0.0, 0.0]]), bbox,
                                unbounded=True)
    assert np.all((np.asarray(far) >= 0) & (np.asarray(far) <= 1))


def test_explicit_material_fit(tmp_path, rng):
    """The color field must be able to overfit a smooth target quickly."""
    mat = ExplicitMaterial({"n_output_dims": 3,
                            "material_activation": "sigmoid",
                            "pos_encoding_config": {
                                "otype": "HashGrid", "n_levels": 8,
                                "n_features_per_level": 2,
                                "log2_hashmap_size": 12,
                                "base_resolution": 4,
                                "per_level_scale": 1.5}})
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(512, 3)), jnp.float32)
    target = (pts + 0.5)  # smooth RGB in [0,1]

    import optax
    opt = optax.adam(3e-3)
    params = mat.params
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean(jnp.abs(mat.apply_fn(p, pts) - target))
        l, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    l0 = None
    for i in range(200):
        params, opt_state, l = step(params, opt_state)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.4 * l0

    # export / reload roundtrip
    mat.params = params
    mat.export(str(tmp_path), "m")
    ref = np.asarray(mat.apply_fn(mat.params, pts))
    mat2 = ExplicitMaterial({"n_output_dims": 3,
                             "material_activation": "sigmoid",
                             "pos_encoding_config": {
                                 "otype": "HashGrid", "n_levels": 8,
                                 "n_features_per_level": 2,
                                 "log2_hashmap_size": 12,
                                 "base_resolution": 4,
                                 "per_level_scale": 1.5}})
    mat2.load(str(tmp_path / "m" / "material.npz"))
    np.testing.assert_allclose(np.asarray(mat2.apply_fn(mat2.params, pts)),
                               ref, atol=1e-6)
