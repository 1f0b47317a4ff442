"""Target-distribution tests: GMM vs oracle, entropy/MI map semantics."""

import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.grid import GridMap
from ergodic_exploration_tpu.ops import target

import oracle

RNG = np.random.default_rng(4)


def _gmm():
    mus = np.array([[1.0, 1.0], [2.5, 0.5]])
    covs = np.array([[[0.1, 0.02], [0.02, 0.2]], [[0.3, 0.0], [0.0, 0.1]]])
    w = np.array([0.7, 0.3])
    return mus, covs, w


def test_gmm_eval_matches_oracle():
    mus, covs, w = _gmm()
    pts = RNG.uniform(0, 3, size=(30, 2))
    g = target.GaussianMixture.create(mus, covs, w)
    got = np.asarray(target.gmm_eval(jnp.asarray(pts, jnp.float32), g))
    want = oracle.gmm_phi(pts, mus, covs, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gmm_create_diag_covs():
    g = target.GaussianMixture.create([[0.0, 0.0]], np.array([[0.5, 0.2]]))
    assert g.covs.shape == (1, 2, 2)
    np.testing.assert_allclose(np.asarray(g.covs[0]), [[0.5, 0.0], [0.0, 0.2]])


def test_normalize_phi_sums_to_one_and_masks():
    vals = jnp.asarray(RNG.uniform(0, 1, 20), jnp.float32)
    mask = jnp.asarray(RNG.uniform(0, 1, 20) > 0.3)
    phi = target.normalize_phi(vals, mask)
    np.testing.assert_allclose(float(jnp.sum(phi)), 1.0, atol=1e-6)
    assert float(jnp.max(jnp.where(mask, 0.0, phi))) == 0.0


def test_normalize_phi_degenerate_falls_back_to_uniform():
    phi = target.normalize_phi(jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(phi), 0.1, atol=1e-6)


def test_entropy_matches_oracle():
    p = np.linspace(0.01, 0.99, 17)
    got = np.asarray(target.entropy(jnp.asarray(p, jnp.float32)))
    np.testing.assert_allclose(got, oracle.cell_entropy(p), atol=1e-4)


def test_mi_map_semantics():
    raw = np.zeros((8, 8), dtype=np.int8)
    raw[0:4, :] = -1  # unknown half
    raw[6, 6] = 100  # one wall cell
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    mi = np.asarray(target.mutual_information_map(g))
    assert mi[1, 1] > mi[5, 1]  # unknown >> known free
    assert mi[6, 6] == 0.0  # occupied zeroed
    np.testing.assert_allclose(mi[1, 1], np.log(2.0), atol=1e-4)  # H(0.5)


def test_mi_target_values_normalized_and_evolving():
    raw = -np.ones((10, 10), dtype=np.int8)
    g0 = GridMap.from_ros(raw, 0.0, 0.0, 0.5)
    pts = g0.domain().sample_lattice((10, 10))
    phi0 = target.mi_target_values(g0, pts)
    np.testing.assert_allclose(float(jnp.sum(phi0)), 1.0, atol=1e-5)
    # reveal a block as free: its information drops
    raw2 = raw.copy()
    raw2[0:5, 0:5] = 0
    g1 = GridMap.from_ros(raw2, 0.0, 0.0, 0.5)
    phi1 = target.mi_target_values(g1, pts)
    p_revealed = jnp.array([[1.0, 1.0]])
    v0 = float(target.sample_map_at(target.mutual_information_map(g0), g0, p_revealed)[0])
    v1 = float(target.sample_map_at(target.mutual_information_map(g1), g1, p_revealed)[0])
    assert v1 < v0
    assert not np.allclose(np.asarray(phi0), np.asarray(phi1))


def _phik_gather_path(g, K, grid_samples, sensor_radius_cells=0,
                      frontier_cells=0):
    """The slow/oracle MI phi_k: gather-sample the lattice, normalize,
    contract with per-point basis tables (what the engine used pre-round-3)."""
    from ergodic_exploration_tpu.ops import basis

    dom = g.domain()
    pts = dom.sample_lattice(grid_samples)
    phi = target.mi_target_values(g, pts, sensor_radius_cells, frontier_cells)
    tbl = basis.tables(pts, K, dom)
    hk = basis.hk_norm(K, dom.lengths)
    return basis.coefficients(tbl, phi, hk)


def test_phik_separable_matches_gather_path():
    """VERDICT r2 item 1: the gather-free separable MI refresh must equal
    the gather path — lattice == grid, lattice != grid (resampling), blurred,
    offset origin, and the degenerate all-occupied fallback."""
    K = 7
    raw = -np.ones((25, 30), dtype=np.int8)  # non-square: catches H/W swaps
    raw[5:15, 3:12] = 0
    raw[8:10, 20:24] = 100
    rng = np.random.default_rng(9)
    raw[20:, :] = rng.choice([-1, 0, 100], size=(5, 30), p=[0.4, 0.5, 0.1]).astype(np.int8)
    for origin, res in (((0.0, 0.0), 0.1), ((-1.25, 0.4), 0.07)):
        g = GridMap.from_ros(raw, origin[0], origin[1], res)
        for ns in ((30, 25), (48, 40), (17, 11)):
            for r in (0, 2):
                want = np.asarray(_phik_gather_path(g, K, ns, r))
                got = np.asarray(target.phik_from_grid_separable(g, K, ns,
                                                                 sensor_radius_cells=r))
                np.testing.assert_allclose(got, want, atol=3e-5,
                                           err_msg=f"{origin} {res} {ns} r={r}")

    # degenerate: fully occupied map -> uniform-over-lattice fallback
    g_occ = GridMap.from_ros(np.full((10, 10), 100, np.int8), 0.0, 0.0, 0.1)
    want = np.asarray(_phik_gather_path(g_occ, K, (12, 12)))
    got = np.asarray(target.phik_from_grid_separable(g_occ, K, (12, 12)))
    np.testing.assert_allclose(got, want, atol=3e-5)
    assert abs(got[0, 0]) > 0.1  # uniform fallback, not ~0 coefficients


def test_engine_phik_from_grid_uses_separable_and_matches():
    """Engine.phik_from_grid (batched) == per-scenario gather oracle, on
    BOTH the general separable path and the shared-domain dense path."""
    from ergodic_exploration_tpu.config import default_config
    from ergodic_exploration_tpu.engine import Engine
    from ergodic_exploration_tpu.grid import Domain

    cfg = default_config("cart").replace(num_basis=6, grid_samples=(20, 20))
    engine = Engine(cfg)
    S = 3
    data = np.full((S, 15, 15), -1.0, np.float32)
    data[:, :7, :] = 0.0
    data[1, 3:5, 3:5] = 1.0
    import jax

    grids = GridMap(jnp.asarray(data), jnp.zeros((S, 2), jnp.float32),
                    jnp.full((S,), 0.1, jnp.float32))
    got = np.asarray(engine.phik_from_grid(grids, sensor_radius_cells=1))
    dom = Domain.create(0.0, 0.0, 1.5, 1.5)  # the maps' shared extent
    got_dense = np.asarray(engine.phik_from_grid(grids, sensor_radius_cells=1,
                                                 domain=dom))
    for i in range(S):
        g1 = jax.tree.map(lambda a: a[i], grids)
        want = np.asarray(_phik_gather_path(g1, 6, (20, 20), 1,
                                            cfg.mi_frontier_cells))
        np.testing.assert_allclose(got[i], want, atol=3e-5)
        np.testing.assert_allclose(got_dense[i], want, atol=3e-5)

    # degenerate fully-occupied maps: dense path falls back to uniform too
    g_occ = GridMap(jnp.ones((S, 15, 15)), jnp.zeros((S, 2), jnp.float32),
                    jnp.full((S,), 0.1, jnp.float32))
    p_sep = np.asarray(engine.phik_from_grid(g_occ))
    p_den = np.asarray(engine.phik_from_grid(g_occ, domain=dom))
    np.testing.assert_allclose(p_den, p_sep, atol=3e-5)
    assert abs(p_den[0, 0, 0]) > 0.1


def test_box_blur_spreads_information():
    raw = np.zeros((9, 9), dtype=np.int8)
    raw[4, 4] = -1  # single unknown cell
    g = GridMap.from_ros(raw, 0.0, 0.0, 0.1)
    mi0 = np.asarray(target.mutual_information_map(g, sensor_radius_cells=0))
    mi2 = np.asarray(target.mutual_information_map(g, sensor_radius_cells=2))
    assert mi0[4, 0] < 1e-4  # known free: only the entropy-clip floor
    assert mi2[4, 2] > 1e-3  # blurred footprint reaches neighbors
    np.testing.assert_allclose(mi0.sum(), mi2.sum(), rtol=0.05)  # roughly conserved
