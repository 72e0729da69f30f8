"""Energy kernel tests against a dense-math oracle.

The oracle assembles the explicit sparse operators of the reference
(G from geometry/mesh_utils.py:38-69 semantics; tet-graph Laplacian L;
M = G^T L^T L G as in tssplat_ext/tet_spheres/tet_spheres.cpp:148) in
float64 numpy and compares energies and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tssplat_tpu.mesh import TetMesh, tet_sphere
from tssplat_tpu.ops import (build_energy_ops, barrier_order,
                             energy_coeff_schedule, smooth_barrier_energy,
                             deformation_gradients)

jax.config.update("jax_enable_x64", False)


_MESH_CACHE = {}


def make_mesh():
    if "mesh" not in _MESH_CACHE:
        verts, tets = tet_sphere(0.55, radius=1.0)
        _MESH_CACHE["mesh"] = TetMesh(verts, tets)
    return _MESH_CACHE["mesh"]


def dense_G(mesh):
    """(9T, 3N) float64 gradient operator: F_flat = G x_flat, row-major F,
    x_flat = x.reshape(-1) with vertex-major [v0x,v0y,v0z,v1x,...]."""
    dX_inv, _ = mesh.rest_matrices()
    T, N = mesh.num_tets, mesh.num_vertices
    G = np.zeros((9 * T, 3 * N))
    for t in range(T):
        vids = mesh.elem[t]
        for r in range(3):
            for c in range(3):
                row = 9 * t + 3 * r + c
                for k in range(3):
                    # dx[r,k] = x[vids[k+1], r] - x[vids[0], r]
                    G[row, 3 * vids[k + 1] + r] += dX_inv[t][k, c]
                    G[row, 3 * vids[0] + r] -= dX_inv[t][k, c]
    return G


def dense_L9(mesh):
    nbrs, deg = mesh.tet_neighbors()
    T = mesh.num_tets
    L = np.zeros((T, T))
    for t in range(T):
        L[t, t] = deg[t]
        for n in nbrs[t]:
            if n >= 0:
                L[t, n] = -1.0
    return np.kron(L, np.eye(9))


def oracle_operators(mesh):
    if "ops" not in _MESH_CACHE:
        G = dense_G(mesh)
        LG = dense_L9(mesh) @ G
        _MESH_CACHE["ops"] = (G, LG)
    return _MESH_CACHE["ops"]


def oracle_energy_grad(mesh, x, c1, c2, order):
    G, LG = oracle_operators(mesh)
    xf = x.reshape(-1).astype(np.float64)
    LGx = LG @ xf
    e_smooth = 0.5 * LGx @ LGx
    F = (G @ xf).reshape(-1, 3, 3)
    J = np.linalg.det(F)
    neg = np.maximum(-J, 0.0)
    e_bar = np.sum(neg ** order)
    energy = c1 * e_smooth + c2 * e_bar

    grad = c1 * (LG.T @ LGx)
    # barrier grad: dE/dF = -p*neg^(p-1) * cof(F) for inverted tets
    dF = np.zeros_like(F)
    for t in range(len(F)):
        if J[t] < 0:
            cof = np.linalg.det(F[t]) * np.linalg.inv(F[t]).T  # d det/dF
            dF[t] = -order * neg[t] ** (order - 1) * cof
    grad += c2 * (G.T @ dF.reshape(-1))
    return energy, grad.reshape(-1, 3)


class TestEnergy:
    def test_zero_at_rest(self):
        mesh = make_mesh()
        ops = build_energy_ops(mesh)
        x = jnp.asarray(mesh.vtx_init, dtype=jnp.float32)
        e = smooth_barrier_energy(x, ops, 1.0, 1.0, 2)
        assert abs(float(e)) < 1e-4

    def test_zero_under_affine(self):
        mesh = make_mesh()
        ops = build_energy_ops(mesh)
        A = np.array([[1.2, 0.1, 0.0], [0.0, 0.9, 0.2], [0.1, 0.0, 1.1]])
        x = jnp.asarray(mesh.vtx_init @ A.T + np.array([0.3, -0.2, 0.5]),
                        dtype=jnp.float32)
        e = smooth_barrier_energy(x, ops, 1.0, 1.0, 2)
        # affine => F constant => LF = 0; det(F) = det(A) > 0 => barrier 0
        assert abs(float(e)) < 1e-3

    @pytest.mark.parametrize("order", [2, 4])
    def test_matches_dense_oracle(self, order, rng):
        mesh = make_mesh()
        ops = build_energy_ops(mesh)
        x_np = mesh.vtx_init + rng.normal(scale=0.05, size=mesh.vtx_init.shape)
        x = jnp.asarray(x_np, dtype=jnp.float32)
        c1, c2 = 0.7, 1.3

        e = float(smooth_barrier_energy(x, ops, c1, c2, order))
        g = jax.grad(lambda xx: smooth_barrier_energy(xx, ops, c1, c2, order))(x)

        e_ref, g_ref = oracle_energy_grad(mesh, x_np, c1, c2, order)
        assert e == pytest.approx(e_ref, rel=2e-3)
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=5e-3, atol=5e-3)

    def test_barrier_activates_on_inversion(self):
        mesh = make_mesh()
        ops = build_energy_ops(mesh)
        x_np = mesh.vtx_init.copy()
        # collapse one tet's vertex through the opposite face to invert it
        t0 = mesh.elem[0]
        centroid = x_np[t0[1:]].mean(axis=0)
        x_np[t0[0]] = 2 * centroid - x_np[t0[0]]
        x = jnp.asarray(x_np, dtype=jnp.float32)
        e_b = smooth_barrier_energy(x, ops, 0.0, 1.0, 2)
        assert float(e_b) > 0

    def test_grad_finite_difference(self, rng):
        mesh = make_mesh()
        ops = build_energy_ops(mesh)
        x_np = (mesh.vtx_init + rng.normal(scale=0.05, size=mesh.vtx_init.shape)
                ).astype(np.float64)

        e_ref, g_ref = oracle_energy_grad(mesh, x_np, 1.0, 1.0, 2)
        eps = 1e-5
        for (i, j) in [(0, 0), (3, 1), (7, 2)]:
            xp = x_np.copy(); xp[i, j] += eps
            xm = x_np.copy(); xm[i, j] -= eps
            ep, _ = oracle_energy_grad(mesh, xp, 1.0, 1.0, 2)
            em, _ = oracle_energy_grad(mesh, xm, 1.0, 1.0, 2)
            fd = (ep - em) / (2 * eps)
            assert fd == pytest.approx(g_ref[i, j], rel=1e-3, abs=1e-5)

    def test_jit_no_recompile_on_order(self):
        mesh = make_mesh()
        ops = build_energy_ops(mesh)
        x = jnp.asarray(mesh.vtx_init, dtype=jnp.float32)
        f = jax.jit(smooth_barrier_energy)
        e2 = f(x, ops, 1.0, 1.0, jnp.asarray(2))
        e4 = f(x, ops, 1.0, 1.0, jnp.asarray(4))
        assert np.isfinite(float(e2)) and np.isfinite(float(e4))


class TestSchedules:
    def test_coeff_ramp(self):
        s0, b0 = energy_coeff_schedule(0, 2e-4, 2e-4)
        assert float(s0) == pytest.approx(2e-4, rel=1e-6)
        s_end, _ = energy_coeff_schedule(1200, 2e-4, 2e-4)
        assert float(s_end) == pytest.approx(16 * 2e-4, rel=1e-5)
        s_mid, _ = energy_coeff_schedule(600, 2e-4, 2e-4)
        assert 2e-4 < float(s_mid) < 16 * 2e-4

    def test_order_switch(self):
        assert int(barrier_order(999, 1000)) == 2
        assert int(barrier_order(1000, 1000)) == 2
        assert int(barrier_order(1001, 1000)) == 4


def test_deformation_gradient_identity_at_rest():
    mesh = make_mesh()
    ops = build_energy_ops(mesh)
    F = deformation_gradients(jnp.asarray(mesh.vtx_init, dtype=jnp.float32),
                              ops.tets, ops.dX_inv)
    eye = np.broadcast_to(np.eye(3), F.shape)
    np.testing.assert_allclose(np.asarray(F), eye, atol=1e-4)


def test_compute_G_matrix_matches_deformation_gradients(rng):
    """Dense G operator (T,9,12) reproduces the gather-form deformation
    gradients on arbitrary deformed states (reference oracle contract,
    geometry/mesh_utils.py:38-69)."""
    import jax.numpy as jnp
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.ops.energy import compute_G_matrix, deformation_gradients
    v, t = tet_sphere(0.12, radius=0.3)
    G = compute_G_matrix(v, t)
    x = v + rng.normal(scale=0.01, size=v.shape)
    xj = jnp.asarray(x, jnp.float32)
    xt = xj[jnp.asarray(t)]                         # (T,4,3)
    F_dense = (G @ xt.reshape(-1, 12, 1))[..., 0].reshape(-1, 3, 3)
    from tssplat_tpu.mesh.tetmesh import tet_rest_matrices
    import numpy as np
    dX_inv, _ = tet_rest_matrices(v, t)
    F_gather = deformation_gradients(xj, jnp.asarray(t), jnp.asarray(dX_inv, jnp.float32))
    np.testing.assert_allclose(np.asarray(F_dense), np.asarray(F_gather),
                               atol=2e-4)


# ---------------------------------------------------------------------------
# Operator-level parity (VERDICT r1 #1): the oracle above shares the repo's
# construction (rest_matrices / tet_neighbors). The assembly below is built
# from scratch — shape-function gradients via per-tet barycentric 4x4
# solves, face adjacency via a face dictionary — and the comparison is
# ENTRYWISE on the implied operator (the smooth energy is quadratic, so its
# Hessian IS c1 * G^T L^T L G), not just its action on one state.
# ---------------------------------------------------------------------------

def _independent_GTLTLG(verts, tets, weighting="uniform"):
    """float64 G^T L^T L G assembled with no shared code with the package:
    F = sum_i x_i (grad phi_i)^T with grad phi from inverting the affine
    vandermonde [x y z 1] per tet; L = D - A over face-adjacent tets."""
    V = np.asarray(verts, np.float64)
    E = np.asarray(tets)
    T, N = len(E), len(V)
    G = np.zeros((T, 9, 3 * N))
    vols = np.zeros(T)
    for t, tet in enumerate(E):
        P = np.concatenate([V[tet], np.ones((4, 1))], axis=1)   # (4,4)
        C = np.linalg.inv(P)                                    # phi coeffs
        gphi = C[:3, :]                                         # (3,4)
        vols[t] = abs(np.linalg.det(P)) / 6.0
        for i in range(4):
            for r in range(3):
                for c in range(3):
                    # F[r,c] = sum_i x[tet[i], r] * gphi[c, i]
                    G[t, 3 * r + c, 3 * tet[i] + r] += gphi[c, i]

    faces = {}
    for t, tet in enumerate(E):
        for f in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
            key = tuple(sorted(int(tet[j]) for j in f))
            faces.setdefault(key, []).append(t)
    A = np.zeros((T, T))
    for ts in faces.values():
        assert len(ts) <= 2
        if len(ts) == 2:
            A[ts[0], ts[1]] = A[ts[1], ts[0]] = 1.0
    L = np.diag(A.sum(1)) - A
    if weighting == "volume":
        L = np.diag(vols / vols.mean()) @ L

    Gf = G.reshape(T, 9, 3 * N)
    LG = np.einsum("tm,mrc->trc", L, Gf).reshape(9 * T, 3 * N)
    return LG.T @ LG


def _hessian_of_smooth(ops, n, weighting_note=""):
    x0 = jnp.zeros((3 * n,), jnp.float32)

    def e(xf):
        return smooth_barrier_energy(xf.reshape(n, 3), ops, 1.0, 0.0, 2)

    # jacrev over grad (reverse-over-reverse): the energy's custom VJP has
    # no forward-mode rule, so jax.hessian (jacfwd∘jacrev) is unavailable
    H = jax.jacrev(jax.grad(e))(x0)
    return np.asarray(H, np.float64)


@pytest.mark.parametrize("weighting", ["uniform", "volume"])
def test_operator_entrywise_parity_independent_assembly(weighting):
    """Hessian of the smooth energy == independently assembled G^T L^T L G,
    entry by entry (reference operator contract: tet_spheres.cpp:148 +
    cusparse SpMV quadratic form, tet_spheres_cuda.cu:118-263)."""
    verts, tets = tet_sphere(0.9, radius=1.0)
    mesh = TetMesh(verts, tets)
    ops = build_energy_ops(mesh, laplacian_weighting=weighting)
    n = mesh.num_vertices
    H = _hessian_of_smooth(ops, n)
    M = _independent_GTLTLG(mesh.vtx_init, mesh.elem, weighting)
    scale = np.abs(M).max()
    np.testing.assert_allclose(H / scale, M / scale, atol=2e-5)


def test_operator_nullspace_is_exactly_affine():
    """ker(G^T L^T L G) is exactly the 12-dim affine motions on a connected
    tet mesh: L F = 0 <=> F constant <=> x affine. Pins the operator's
    structure independent of any weighting convention."""
    verts, tets = tet_sphere(0.9, radius=1.0)
    M = _independent_GTLTLG(verts, tets)
    w = np.linalg.eigvalsh(M)
    assert np.all(np.abs(w[:12]) < 1e-10 * w[-1])      # 12 exact null modes
    assert w[12] > 1e8 * np.abs(w[:12]).max()          # then a hard gap


@pytest.mark.parametrize("weighting", ["uniform", "volume"])
@pytest.mark.parametrize("order", [2, 4])
def test_custom_vjp_matches_autodiff(weighting, order, rng):
    """The all-gather custom VJP (_sb_bwd) must equal plain autodiff of the
    reference implementation — including gradients w.r.t. c1/c2 and on
    states with inverted tets (cofactor barrier branch)."""
    from tssplat_tpu.ops.energy import smooth_barrier_energy_ref
    mesh = make_mesh()
    ops = build_energy_ops(mesh, laplacian_weighting=weighting)
    x_np = mesh.vtx_init + rng.normal(scale=0.2, size=mesh.vtx_init.shape)
    x = jnp.asarray(x_np, jnp.float32)

    def e_custom(xx, c1, c2):
        return smooth_barrier_energy(xx, ops, c1, c2, order)

    def e_auto(xx, c1, c2):
        return smooth_barrier_energy_ref(xx, ops, c1, c2, order)

    args = (x, jnp.float32(0.7), jnp.float32(1.3))
    v1, g1 = jax.value_and_grad(e_custom, argnums=(0, 1, 2))(*args)
    v2, g2 = jax.value_and_grad(e_auto, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    scale = max(float(jnp.abs(g2[0]).max()), 1e-8)
    np.testing.assert_allclose(np.asarray(g1[0]) / scale,
                               np.asarray(g2[0]) / scale, atol=5e-5)
    for a, b in zip(g1[1:], g2[1:]):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_fold_zero_gradient_for_unreferenced_vertex():
    """A vertex referenced by NO tet (possible after remeshing/import)
    must get an exactly-zero energy gradient — the segmented-scan fold's
    -1 sentinel; without it the fold aliased the previous vertex's
    segment total (round-5 review finding, confirmed by repro)."""
    import jax
    import jax.numpy as jnp
    from tssplat_tpu.mesh.spheres import tet_sphere
    from tssplat_tpu.mesh.tetmesh import TetMesh
    from tssplat_tpu.ops.energy import build_energy_ops, \
        smooth_barrier_energy

    v, t = tet_sphere(0.2, radius=0.3)
    # append an isolated vertex no tet references
    v2 = np.concatenate([v, np.asarray([[9.0, 9.0, 9.0]])], axis=0)

    class M:
        pass
    mesh = TetMesh(v2, t)
    ops = build_energy_ops(mesh)
    x = jnp.asarray(v2, jnp.float32) * 1.03   # off rest state
    g = jax.grad(lambda xx: smooth_barrier_energy(
        xx, ops, 1.0, 1.0, jnp.int32(2)))(x)
    assert float(jnp.abs(g[-1]).max()) == 0.0
    # and a real vertex still gets a nonzero gradient
    assert float(jnp.abs(g[:-1]).max()) > 0.0
