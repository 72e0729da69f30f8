"""NN zoo: activations, positional/hash-grid encodings (with progressive band
masking), small MLPs — functional (init_fn, apply_fn, n_output_dims) triples.

Capability parity with the reference zoo (reference: models/networks.py):
activation table (:16-49), ProgressiveBandFrequency (:56-94), HashGrid
encoding (tiny-cuda-nn config keys, :97-106), ProgressiveBandHashGrid
(:109-148), CompositeEncoding xyz-concat (:151-172), VanillaMLP (:195-235),
SphereInitVanillaMLP geometric init (:238-311), factories (:175-192,324-339,
373-394), scale_tensor (:407-418).

TPU-native: the hash-grid is a plain XLA gather over an (L*2^H, F) f32 table
with trilinear blending — at this size (<=2^19 x 32 feats) the fused
tiny-cuda-nn kernel buys nothing on TPU; XLA fuses the gathers with the
following dense layers. MLPs run in f32 on the MXU via
``preferred_element_type``; every apply is shape-polymorphic over leading
batch dims.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# activations (reference models/networks.py:16-49)
# ---------------------------------------------------------------------------

def get_activation(name) -> Callable:
    if name is None:
        return lambda x: x
    name_l = str(name).lower()
    table = {
        "none": lambda x: x,
        "lin2srgb": lambda x: jnp.clip(
            jnp.where(x > 0.0031308,
                      jnp.power(jnp.clip(x, min=0.0031308), 1.0 / 2.4)
                      * 1.055 - 0.055,
                      12.92 * x), 0.0, 1.0),
        "exp": jnp.exp,
        "shifted_exp": lambda x: jnp.exp(x - 1.0),
        "trunc_exp": lambda x: jnp.exp(jnp.clip(x, max=15.0)),
        "shifted_trunc_exp": lambda x: jnp.exp(jnp.clip(x - 1.0, max=15.0)),
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "shifted_softplus": lambda x: jax.nn.softplus(x - 1.0),
        "scale_-11_01": lambda x: x * 0.5 + 0.5,
        "relu": jax.nn.relu,
        "softplus": jax.nn.softplus,
    }
    if name_l in table:
        return table[name_l]
    if hasattr(jax.nn, name_l):
        return getattr(jax.nn, name_l)
    raise ValueError(f"Unknown activation function: {name}")


def scale_tensor(dat, inp_scale, tgt_scale):
    """Affine rescale from inp_scale range to tgt_scale range
    (reference :407-418). Scales may be scalars or per-dim arrays; an
    (2,D) bbox is supported for inp_scale."""
    if inp_scale is None:
        inp_scale = (0.0, 1.0)
    if tgt_scale is None:
        tgt_scale = (0.0, 1.0)
    lo_i, hi_i = inp_scale[0], inp_scale[1]
    lo_t, hi_t = tgt_scale[0], tgt_scale[1]
    dat = (dat - lo_i) / (hi_i - lo_i)
    return dat * (hi_t - lo_t) + lo_t


# ---------------------------------------------------------------------------
# encodings
# ---------------------------------------------------------------------------

class Module(NamedTuple):
    """Functional module: params = init_fn(key); y = apply_fn(params, x[, step])."""
    init_fn: Callable
    apply_fn: Callable
    n_output_dims: int
    n_input_dims: int


_HASH_PRIMES = np.asarray([1, 2654435761, 805459861], dtype=np.uint32)


def _hash_coords(coords: jnp.ndarray, hashmap_size: int) -> jnp.ndarray:
    """Spatial hash of integer grid coords (…,3) -> [0, hashmap_size)."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * _HASH_PRIMES[0]
    h = h ^ (c[..., 1] * _HASH_PRIMES[1])
    h = h ^ (c[..., 2] * _HASH_PRIMES[2])
    return (h % jnp.uint32(hashmap_size)).astype(jnp.int32)


_CORNERS = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                indexing="ij"), axis=-1).reshape(8, 3)


def _grid_levels(n_levels, base_resolution, per_level_scale,
                 log2_hashmap_size):
    """Per-level grid resolutions + dense/hashed flags (tcnn semantics:
    levels whose dense (r+1)^3 grid fits the table are collision-free)."""
    H = 1 << log2_hashmap_size
    res = [int(math.floor(base_resolution * per_level_scale ** l))
           for l in range(n_levels)]
    dense = [(r + 1) ** 3 <= H for r in res]
    return res, dense, H


def _grid_level_setup(x, r):
    xl = x * r                                             # [0, r]
    i0 = jnp.floor(xl).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, r - 1)
    return i0, xl - i0                                     # int corner, frac


def _grid_corner_idx(i0, corner, l, res, dense, H):
    c = i0 + corner                                        # (…,3)
    if dense[l]:
        r = res[l]
        idx = (c[..., 0] * (r + 1) + c[..., 1]) * (r + 1) + c[..., 2]
    else:
        idx = _hash_coords(c, H)
    return idx + l * H


def _grid_exact(table, x, res, dense, H):
    """Exact multi-level trilinear lookup (…,3) -> (…, L*F)."""
    outs = []
    for l in range(len(res)):
        i0, w = _grid_level_setup(x, res[l])
        feats = 0.0
        for corner in _CORNERS:
            wc = jnp.prod(jnp.where(corner.astype(bool), w, 1.0 - w),
                          axis=-1)                         # (…,)
            feats = feats + table[_grid_corner_idx(i0, corner, l, res,
                                                   dense, H)] \
                * wc[..., None]
        outs.append(feats)
    return jnp.concatenate(outs, axis=-1)


def _grid_corner_indices_np(xc: np.ndarray, res, dense, H):
    """Host-side (numpy) corner table indices + trilinear weights for every
    (point, level, corner): returns (idx (N,L,8) int64 WITH the l*H level
    offset, w (N,L,8) f32). Bit-exact with the traced _exact lookup — the
    bucketed-gradient builder sorts these once for a frozen point set."""
    xc = np.asarray(xc, np.float32)
    N = xc.shape[0]
    L = len(res)
    idx = np.empty((N, L, 8), np.int64)
    wgt = np.empty((N, L, 8), np.float32)
    for l, r in enumerate(res):
        xl = xc * np.float32(r)
        i0 = np.clip(np.floor(xl).astype(np.int32), 0, r - 1)
        w = xl - i0                                       # (N,3) f32
        for ci, corner in enumerate(_CORNERS):
            c = i0 + corner                               # (N,3)
            if dense[l]:
                ii = (c[:, 0].astype(np.int64) * (r + 1)
                      + c[:, 1]) * (r + 1) + c[:, 2]
            else:
                cu = c.astype(np.uint32)
                h = cu[:, 0] * _HASH_PRIMES[0]
                h = h ^ (cu[:, 1] * _HASH_PRIMES[1])
                h = h ^ (cu[:, 2] * _HASH_PRIMES[2])
                ii = (h % np.uint32(H)).astype(np.int64)
            idx[:, l, ci] = ii + l * H
            wgt[:, l, ci] = np.prod(
                np.where(corner.astype(bool)[None, :], w, 1.0 - w), axis=-1)
    return idx, wgt


def hash_grid_encoding(n_input_dims: int = 3, n_levels: int = 16,
                       n_features_per_level: int = 2,
                       log2_hashmap_size: int = 19, base_resolution: int = 16,
                       per_level_scale: float = 1.447269237440378,
                       init_scale: float = 1e-4,
                       stochastic_table_grad: bool = False) -> Module:
    """Multi-resolution hash-grid encoding (InstantNGP; the reference uses
    tiny-cuda-nn's with these defaults, materials/explicit_material.py:38-46).

    Input in [0,1]^3; output (…, n_levels*n_features_per_level). Levels whose
    dense grid fits in the table are indexed densely (collision-free), larger
    ones via spatial hashing — tiny-cuda-nn semantics.

    ``stochastic_table_grad`` + a ``grad_key`` kwarg at apply time switch
    the TABLE gradient to a one-corner-per-level importance sample: the
    trilinear weights of a point sum to 1, so scattering the unscaled
    feature cotangent at corner c drawn with p(c)=w_c is an unbiased
    estimator of the exact 8-corner gradient with 8x fewer scatter rows —
    TPU scatter-add costs ~70 ns/row no matter how the ops are fused, and
    the exact sampled-texture backward is scatter-bound. The forward (and
    the position gradient) stay exact.
    """
    assert n_input_dims == 3, "hash grid implemented for 3-D inputs"
    res, dense, H = _grid_levels(n_levels, base_resolution, per_level_scale,
                                 log2_hashmap_size)
    F = n_features_per_level
    L = n_levels

    def init_fn(key):
        return {"table": jax.random.uniform(
            key, (n_levels * H, F), jnp.float32, -init_scale, init_scale)}

    def _level_setup(x, l):
        return _grid_level_setup(x, res[l])

    def _corner_idx(i0, corner, l):
        return _grid_corner_idx(i0, corner, l, res, dense, H)

    def _exact(table, x):
        return _grid_exact(table, x, res, dense, H)

    @jax.custom_vjp
    def _enc_sg(table, x, u):
        del u
        return _exact(table, x)

    def _enc_sg_fwd(table, x, u):
        return _exact(table, x), (table, x, u)

    def _enc_sg_bwd(resid, d_out):
        table, x, u = resid
        N = x.shape[:-1]
        d_feats = d_out.reshape(*N, L, F)
        idx_lv, val_lv = [], []
        for l in range(L):
            i0, w = _level_setup(x, l)
            # draw corner csel with p = trilinear weight via the cumulative
            # where-chain (elementwise; a take_along_axis over the 8-corner
            # axis would lower to a slow TPU gather)
            acc = jnp.zeros(N, x.dtype)
            csel = jnp.full(N, 7, jnp.int32)
            ul = u[..., l]
            for ci in range(7):                            # corner 7 = rest
                corner = _CORNERS[ci]
                wc = jnp.prod(jnp.where(corner.astype(bool), w, 1.0 - w),
                              axis=-1)
                hit = (ul >= acc) & (ul < acc + wc) & (csel == 7)
                csel = jnp.where(hit, ci, csel)
                acc = acc + wc
            # _CORNERS row i is the bit pattern (i>>2, i>>1, i) & 1
            corner_sel = jnp.stack([(csel >> 2) & 1, (csel >> 1) & 1,
                                    csel & 1], axis=-1)
            idx_lv.append(_corner_idx(i0, corner_sel, l))  # (…,)
            val_lv.append(d_feats[..., l, :])              # (…,F)
        flat_idx = jnp.stack(idx_lv, axis=-1).reshape(-1)  # (N*L,)
        flat_val = jnp.stack(val_lv, axis=-2).reshape(-1, F)
        d_table = jax.ops.segment_sum(flat_val, flat_idx,
                                      num_segments=L * H)
        # exact position gradient (XLA DCEs this whole subgraph when the
        # positions are stop-gradient upstream, e.g. the frozen-geometry
        # texture stage)
        _, vjp = jax.vjp(lambda xx: _exact(table, xx), x)
        (d_x,) = vjp(d_out)
        return d_table, d_x, jnp.zeros_like(u)

    _enc_sg.defvjp(_enc_sg_fwd, _enc_sg_bwd)

    def apply_fn(params, x, step=None, grad_key=None):
        if stochastic_table_grad and grad_key is not None:
            u = jax.random.uniform(grad_key, (*x.shape[:-1], L))
            return _enc_sg(params["table"], x, u)
        return _exact(params["table"], x)

    return Module(init_fn, apply_fn, n_levels * F, n_input_dims)


def build_hash_grad_buckets(xc: np.ndarray, n_levels: int = 16,
                            n_features_per_level: int = 2,
                            log2_hashmap_size: int = 19,
                            base_resolution: int = 16,
                            per_level_scale: float = 1.447269237440378,
                            **_ignored) -> dict:
    """Static bucketing of a FROZEN point set's hash-table contributions.

    The exact texture stage's bottleneck is the hash-grid TABLE gradient:
    autodiff turns the (levels x corners) gathers into 128 scatter-adds
    over every pixel — TPU scatter costs ~70 ns/ROW regardless of fusion
    (BASELINE.md), ~10 s/step at 8x512^2. But the texture stage never
    moves the geometry (reference trainer.py:44-48 freezes it), so the
    (point, level, corner) -> table-row map is STATIC. Precompute it once:
    per level, sort the 8N contributions by table row and record
      src   (8N,) i32 — contributing point of each sorted slot
      w     (8N,) f32 — its trilinear weight
      start/end (2^H,) i32 — each table row's slot range
    The backward then needs NO scatter at all: gather cotangent rows by
    ``src``, weight, prefix-sum, and difference the prefix at the static
    row boundaries (bucketed_hash_encoding). Build cost: one numpy argsort
    per level, host-side, at stage start.

    ``xc`` must be the CONTRACTED [0,1]^3 positions in the exact order the
    encoding will be applied to at step time."""
    res, dense, H = _grid_levels(n_levels, base_resolution, per_level_scale,
                                 log2_hashmap_size)
    idx, wgt = _grid_corner_indices_np(np.asarray(xc, np.float32),
                                       res, dense, H)
    levels = []
    for l in range(n_levels):
        flat_idx = (idx[:, l, :] - l * H).reshape(-1)      # [0, H)
        order = np.argsort(flat_idx, kind="stable")
        src = (order // 8).astype(np.int32)                # point row
        w_sorted = wgt[:, l, :].reshape(-1)[order].astype(np.float32)
        counts = np.bincount(flat_idx, minlength=H)
        end = np.cumsum(counts).astype(np.int32)           # (H,)
        start = np.concatenate([[0], end[:-1]]).astype(np.int32)
        levels.append({"src": src, "w": w_sorted,
                       "start": start, "end": end})
    return {"levels": levels, "n": int(xc.shape[0]), "res": res,
            "dense": dense, "H": H, "L": n_levels,
            "F": n_features_per_level}


def bucketed_hash_encoding_traced(meta: dict):
    """Like bucketed_hash_encoding, but the per-level bucket tables are
    TRACED arguments instead of baked constants — so per-device bucket
    tables can ride a shard_map (the view-DP exact texture stage gives
    each device its own views' buckets, materials/exact_stage.py).

    ``meta`` carries only the static fields of build_hash_grad_buckets'
    result (res, dense, H, L, F). Returns ``enc(table, x, lv)`` where
    ``lv`` is the per-level list of {src, w, start, end} ARRAYS — the
    index fields stay INTEGER (start/end reach 8*N which exceeds f32's
    2^24 exact-integer range already at 60 views x 512^2; a float carrier
    would silently mis-bucket the table gradient); their cotangents are
    float0 like every integer primal."""
    res, dense, H = meta["res"], meta["dense"], meta["H"]
    L, F = meta["L"], meta["F"]

    @jax.custom_vjp
    def enc(table, x, lv):
        return _grid_exact(table, x, res, dense, H)

    def fwd(table, x, lv):
        return _grid_exact(table, x, res, dense, H), (table, x, lv)

    def bwd(resid, d_out):
        table, x, lv = resid
        # precision note: each bucket's gradient is a difference of two
        # nearby values of an f32 prefix sum over up to 8N rows; signed
        # cotangents random-walk, so the prefix magnitude is ~O(sqrt(8N))
        # x mean|ct| and the absolute error per bucket is ~eps x that —
        # measured 6e-6 on 3.2-magnitude grads at N=500, and the parity
        # test budgets 2e-4 x max|grad| at stage scale. If a future
        # workload needs tighter bounds at very large N, switch to
        # per-level segment-local (pairwise) reductions.
        d_feats = d_out.reshape(-1, L, F)                  # (N,L,F)
        slices = []
        for l in range(L):
            ct_l = d_feats[:, l, :]                        # (N,F)
            src = lv[l]["src"].astype(jnp.int32)
            vals = ct_l[src] * lv[l]["w"][:, None]         # (8N,F)
            csum = jnp.concatenate(
                [jnp.zeros((1, F), vals.dtype), jnp.cumsum(vals, axis=0)])
            end = lv[l]["end"].astype(jnp.int32)
            start = lv[l]["start"].astype(jnp.int32)
            seg = csum[end] - csum[start]                  # (H,F)
            slices.append(seg)
        d_table = jnp.concatenate(slices, axis=0)          # (L*H,F)
        _, vjp = jax.vjp(lambda xx: _grid_exact(table, xx, res, dense, H), x)
        (d_x,) = vjp(d_out)

        def zero_ct(t):
            if jnp.issubdtype(t.dtype, jnp.floating):
                return jnp.zeros_like(t)
            return np.zeros(np.shape(t), jax.dtypes.float0)
        d_lv = jax.tree_util.tree_map(zero_ct, lv)
        return d_table, d_x, d_lv

    enc.defvjp(fwd, bwd)
    return enc


def buckets_as_arrays(levels) -> list:
    """Per-level bucket dicts as device arrays in their NATIVE dtypes —
    index fields (src/start/end) stay int32 (8N exceeds f32's exact-int
    range at production texture scales), weights f32."""
    return [{k: jnp.asarray(v) for k, v in d.items()} for d in levels]


def bucketed_hash_encoding(buckets: dict):
    """Exact hash-grid apply whose TABLE gradient uses the static buckets
    (see build_hash_grad_buckets): scatter-free backward built from row
    gathers + per-level prefix sums + static boundary differences. The
    position gradient stays exact-by-autodiff (DCE'd when positions are
    frozen upstream — the texture stage). Returns apply(params, x) where
    ``x`` MUST be the (…,3) contracted positions the buckets were built
    from, in the same flattened order."""
    enc = bucketed_hash_encoding_traced(buckets)
    lv = buckets_as_arrays(buckets["levels"])

    def apply_fn(params, x, step=None, grad_key=None):
        return enc(params["table"], x, lv)

    return apply_fn


def progressive_band_hash_grid(n_input_dims: int = 3, start_level: int = 4,
                               start_step: int = 0, update_steps: int = 500,
                               **kwargs) -> Module:
    """Hash grid with coarse-to-fine level masking (reference :109-148):
    ``start_level`` levels active at ``start_step``, one more unlocked every
    ``update_steps`` steps. ``step`` may be traced."""
    grid = hash_grid_encoding(n_input_dims, **kwargs)
    n_levels = kwargs.get("n_levels", 16)
    F = kwargs.get("n_features_per_level", 2)

    def apply_fn(params, x, step=0, grad_key=None):
        feats = grid.apply_fn(params, x, grad_key=grad_key)
        step = jnp.asarray(step)
        current = start_level + jnp.maximum(step - start_step, 0) // update_steps
        mask = (jnp.arange(n_levels) < current)
        mask = jnp.repeat(mask, F).astype(feats.dtype)
        return feats * mask

    return Module(grid.init_fn, apply_fn, grid.n_output_dims, n_input_dims)


def frequency_encoding(n_input_dims: int, n_frequencies: int = 10,
                       n_masking_step: int = 0) -> Module:
    """NeRF positional encoding with optional progressive band masking
    (reference ProgressiveBandFrequency, :56-94): weight per frequency
    ``(1 - cos(pi * clamp(alpha - j, 0, 1))) / 2`` with
    ``alpha = step / n_masking_step * N_freqs``."""
    freqs = 2.0 ** np.arange(n_frequencies)
    n_out = n_input_dims * n_frequencies * 2

    def init_fn(key):
        return {}

    def apply_fn(params, x, step=0, grad_key=None):
        xs = x[..., None] * freqs                          # (…,D,Nf)
        enc = jnp.stack([jnp.sin(xs), jnp.cos(xs)], axis=-1)  # (…,D,Nf,2)
        if n_masking_step > 0:
            alpha = jnp.asarray(step, jnp.float32) / n_masking_step * n_frequencies
            j = jnp.arange(n_frequencies, dtype=jnp.float32)
            w = (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - j, 0.0, 1.0))) / 2.0
            enc = enc * w[:, None]
        return enc.reshape(*x.shape[:-1], n_out)

    return Module(init_fn, apply_fn, n_out, n_input_dims)


def composite_encoding(enc: Module, include_xyz: bool = False,
                       xyz_scale: float = 2.0, xyz_offset: float = -1.0
                       ) -> Module:
    """Optionally concatenate (scaled) xyz to an encoding (reference :151-172)."""
    if not include_xyz:
        return enc

    def apply_fn(params, x, step=0, grad_key=None):
        return jnp.concatenate([x * xyz_scale + xyz_offset,
                                enc.apply_fn(params, x, step,
                                             grad_key=grad_key)], axis=-1)

    return Module(enc.init_fn, apply_fn, enc.n_output_dims + enc.n_input_dims,
                  enc.n_input_dims)


def get_encoding(n_input_dims: int, config: dict) -> Module:
    """Factory keyed on tiny-cuda-nn ``otype`` names (reference :175-192)."""
    cfg = dict(config)
    otype = cfg.pop("otype", "HashGrid")
    include_xyz = cfg.pop("include_xyz", False)
    xyz_scale = cfg.pop("xyz_scale", 2.0)
    xyz_offset = cfg.pop("xyz_offset", -1.0)
    if otype in ("HashGrid", "Grid"):
        enc = hash_grid_encoding(n_input_dims, **_grid_kwargs(cfg))
    elif otype == "ProgressiveBandHashGrid":
        enc = progressive_band_hash_grid(
            n_input_dims, start_level=cfg.pop("start_level", 4),
            start_step=cfg.pop("start_step", 0),
            update_steps=cfg.pop("update_steps", 500), **_grid_kwargs(cfg))
    elif otype in ("Frequency", "ProgressiveBandFrequency"):
        enc = frequency_encoding(
            n_input_dims, n_frequencies=cfg.get("n_frequencies", 10),
            n_masking_step=cfg.get("n_masking_step", 0))
    else:
        raise ValueError(f"unknown encoding otype {otype!r}")
    return composite_encoding(enc, include_xyz, xyz_scale, xyz_offset)


def _grid_kwargs(cfg: dict) -> dict:
    keys = ("n_levels", "n_features_per_level", "log2_hashmap_size",
            "base_resolution", "per_level_scale", "stochastic_table_grad")
    return {k: cfg[k] for k in keys if k in cfg}


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------

def _dense(params, x, name, act=None):
    y = jnp.dot(x, params[name + "_w"],
                preferred_element_type=jnp.float32) + params[name + "_b"]
    return act(y) if act is not None else y


def vanilla_mlp(dim_in: int, dim_out: int, n_neurons: int = 64,
                n_hidden_layers: int = 1, activation: str = "ReLU",
                output_activation: str = "none") -> Module:
    """Plain MLP (reference VanillaMLP, :195-235): n_hidden_layers hidden
    blocks of width n_neurons."""
    act = get_activation(activation)
    out_act = get_activation(output_activation)
    dims = [dim_in] + [n_neurons] * n_hidden_layers + [dim_out]

    def init_fn(key):
        params = {}
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            key, sub = jax.random.split(key)
            # He init, matching torch Linear + ReLU practice
            params[f"l{i}_w"] = jax.random.normal(sub, (a, b), jnp.float32) \
                * math.sqrt(2.0 / a)
            params[f"l{i}_b"] = jnp.zeros((b,), jnp.float32)
        return params

    def apply_fn(params, x, step=None):
        h = x
        for i in range(len(dims) - 2):
            h = _dense(params, h, f"l{i}", act)
        return out_act(_dense(params, h, f"l{len(dims) - 2}"))

    return Module(init_fn, apply_fn, dim_out, dim_in)


def sphere_init_mlp(dim_in: int, dim_out: int, n_neurons: int = 64,
                    n_hidden_layers: int = 1, sphere_radius: float = 0.5,
                    inside_out: bool = False) -> Module:
    """SDF-style geometric initialization (reference SphereInitVanillaMLP,
    :238-311): the freshly initialized network approximates the SDF of a
    sphere of ``sphere_radius``. Softplus(beta=100) activations."""
    beta = 100.0

    def act(x):
        return jax.nn.softplus(x * beta) / beta

    dims = [dim_in] + [n_neurons] * n_hidden_layers + [dim_out]

    def init_fn(key):
        params = {}
        n = len(dims) - 1
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            key, sub = jax.random.split(key)
            if i == n - 1:      # output layer
                mean = math.sqrt(math.pi) / math.sqrt(a)
                w = jax.random.normal(sub, (a, b)) * 1e-4 + mean
                bias = jnp.full((b,), -sphere_radius)
            elif i == 0:        # first layer: weights only on raw xyz
                w = jnp.zeros((a, b))
                w = w.at[:3].set(jax.random.normal(sub, (3, b))
                                 * math.sqrt(2.0 / b))
                bias = jnp.zeros((b,))
            else:
                w = jax.random.normal(sub, (a, b)) * math.sqrt(2.0 / b)
                bias = jnp.zeros((b,))
            if inside_out and i == n - 1:
                w, bias = -w, -bias
            params[f"l{i}_w"] = w.astype(jnp.float32)
            params[f"l{i}_b"] = bias.astype(jnp.float32)
        return params

    def apply_fn(params, x, step=None):
        h = x
        for i in range(len(dims) - 2):
            h = act(_dense(params, h, f"l{i}"))
        return _dense(params, h, f"l{len(dims) - 2}")

    return Module(init_fn, apply_fn, dim_out, dim_in)


def get_mlp(dim_in: int, dim_out: int, config: dict) -> Module:
    """Factory (reference :324-339)."""
    cfg = dict(config)
    otype = cfg.pop("otype", "VanillaMLP")
    if otype in ("VanillaMLP", "FullyFusedMLP", "CutlassMLP", "TCNNNetwork"):
        return vanilla_mlp(dim_in, dim_out,
                           n_neurons=cfg.get("n_neurons", 64),
                           n_hidden_layers=cfg.get("n_hidden_layers", 1),
                           activation=cfg.get("activation", "ReLU"),
                           output_activation=cfg.get("output_activation", "none"))
    if otype == "SphereInitVanillaMLP":
        return sphere_init_mlp(dim_in, dim_out,
                               n_neurons=cfg.get("n_neurons", 64),
                               n_hidden_layers=cfg.get("n_hidden_layers", 1),
                               sphere_radius=cfg.get("sphere_init_radius", 0.5),
                               inside_out=cfg.get("inside_out", False))
    raise ValueError(f"unknown mlp otype {otype!r}")


def create_network_with_input_encoding(n_input_dims: int, n_output_dims: int,
                                       encoding_config: dict,
                                       network_config: dict) -> Module:
    """Encoding -> MLP composition (reference :373-394)."""
    enc = get_encoding(n_input_dims, encoding_config)
    mlp = get_mlp(enc.n_output_dims, n_output_dims, network_config)

    def init_fn(key):
        k1, k2 = jax.random.split(key)
        return {"encoding": enc.init_fn(k1), "network": mlp.init_fn(k2)}

    def apply_fn(params, x, step=0):
        return mlp.apply_fn(params["network"],
                            enc.apply_fn(params["encoding"], x, step))

    return Module(init_fn, apply_fn, n_output_dims, n_input_dims)
