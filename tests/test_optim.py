"""AdamUniform tests against a numpy oracle that transcribes the reference
update rule (reference: utils/optimizer.py:38-89) step by step."""

import numpy as np
import jax
import jax.numpy as jnp

from tssplat_tpu.optim import adam_uniform, cosine_annealing_lr, apply_updates


def oracle_steps(p0, grads, lr_fn, b1=0.9, b2=0.999, grad_limit=False,
                 values=(0.05, 0.01), iters=(4000,)):
    """Numpy transcription of the reference AdamUniform semantics."""
    p = p0.copy()
    g1 = np.zeros_like(p)
    g2 = np.zeros_like(p)
    step = 0
    cc = 0
    ptr = 0
    out = []
    for g in grads:
        lr = lr_fn(step)
        step += 1
        g1 = b1 * g1 + (1 - b1) * g
        g2 = b2 * g2 + (1 - b2) * g * g
        m1 = g1 / (1 - b1 ** step)
        m2 = g2 / (1 - b2 ** step)
        gr = m1 / (1e-8 + np.sqrt(m2).max())
        if grad_limit:
            m = values[min(ptr, len(values) - 1)]
            if ptr < len(iters) and cc >= iters[ptr]:
                ptr += 1
            s = np.abs(gr).max()
            if s > m:
                gr = gr * (m / s)
        p = p - lr * gr
        cc += 1
        out.append(p.copy())
    return out


def run_jax(p0, grads, lr, b1=0.9, b2=0.999, **kw):
    init, update = adam_uniform(lr, b1=b1, b2=b2, **kw)
    p = jnp.asarray(p0)
    state = init(p)
    outs = []
    upd = jax.jit(update)
    for g in grads:
        u, state = upd(jnp.asarray(g), state, p)
        p = apply_updates(p, u)
        outs.append(np.asarray(p))
    return outs


def test_adam_uniform_matches_oracle(rng):
    p0 = rng.normal(size=(50, 3)).astype(np.float32)
    grads = [rng.normal(size=(50, 3)).astype(np.float32) * 10 ** rng.uniform(-2, 1)
             for _ in range(12)]
    ours = run_jax(p0, grads, 0.2)
    ref = oracle_steps(p0, grads, lambda t: 0.2)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_grad_limit_stages(rng):
    """Cap 0.05 for the first 4 steps, then 0.01 from step 5 on (the stage
    advance fires when cc reaches iters[0]=4 and takes effect next step)."""
    p0 = rng.normal(size=(20,)).astype(np.float32)
    grads = [rng.normal(size=(20,)).astype(np.float32) * 100 for _ in range(8)]
    kw = dict(grad_limit=True, grad_limit_values=(0.05, 0.01),
              grad_limit_iters=(4,))
    ours = run_jax(p0, grads, 0.1, **kw)
    ref = oracle_steps(p0, grads, lambda t: 0.1, grad_limit=True,
                       values=(0.05, 0.01), iters=(4,))
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    # the cap actually binds: per-step |delta| <= lr * cap (+ slack)
    deltas = np.abs(np.diff(np.stack([p0] + ours), axis=0)).max(axis=1)
    assert np.all(deltas <= 0.1 * 0.05 + 1e-6)
    assert np.all(deltas[5:] <= 0.1 * 0.01 + 1e-6)


def test_cosine_lr_matches_torch_formula():
    sched = cosine_annealing_lr(0.2, 100, eta_min=1e-4)
    ts = np.arange(0, 101)
    ours = np.array([float(sched(t)) for t in ts])
    ref = 1e-4 + (0.2 - 1e-4) * (1 + np.cos(np.pi * ts / 100)) / 2
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-6)
    assert abs(ours[0] - 0.2) < 1e-6 and abs(ours[100] - 1e-4) < 1e-6


def test_uniform_denominator_is_global_max(rng):
    """One huge-gradient component must scale down the whole tensor's update
    (the defining difference from per-component Adam)."""
    p0 = np.zeros((4,), np.float32)
    g = np.array([1e-3, 1e-3, 1e-3, 10.0], np.float32)
    ours = run_jax(p0, [g], 1.0)[0]
    # denominator = sqrt(m2).max() ≈ |g_max| after bias correction
    expected = -(g / (1e-8 + np.abs(g).max()))
    np.testing.assert_allclose(ours, expected, rtol=1e-4)
