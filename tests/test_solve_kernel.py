"""Fused Pallas descent core == vmapped ErgodicController.step.

The fused path (ops/solve_kernel.py, interpret mode on CPU) must reproduce
the reference-parity controller to fp32-reassociation tolerance across a
multi-tick closed batch with obstacles, history sampling, and live safety.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergodic_exploration_tpu.config import default_config
from ergodic_exploration_tpu.engine import Engine
from ergodic_exploration_tpu.grid import Domain, GridMap
from ergodic_exploration_tpu.ops import target as target_ops

# interpret-mode Pallas dominates CPU suite wall time; iterate fast with
# `pytest -m 'not fused'`, run the full suite before committing
pytestmark = pytest.mark.fused


def _case(model: str, S: int = 8, seed: int = 3):
    cfg = default_config(model).replace(num_basis=6, buffer_capacity=64)
    domain = Domain.create(0.0, 0.0, 3.0, 3.0)
    rng = np.random.default_rng(seed)
    x0 = np.concatenate(
        [rng.uniform(0.4, 2.6, (S, 2)), rng.uniform(-np.pi, np.pi, (S, 1))], axis=1
    ).astype(np.float32)
    data = np.zeros((60, 60), np.float32)
    data[28:32, 12:48] = 1.0  # wall through the middle
    grids = GridMap(
        data=jnp.broadcast_to(jnp.asarray(data), (S, 60, 60)),
        origin=jnp.zeros((S, 2), jnp.float32),
        resolution=jnp.full((S,), 0.05, jnp.float32),
    )
    gmm = target_ops.GaussianMixture.create(
        means=rng.uniform(0.5, 2.5, (S, 2, 2)).astype(np.float32),
        covs=np.tile((0.2 * np.eye(2, dtype=np.float32))[None, None], (S, 2, 1, 1)),
        weights=np.ones((S, 2), np.float32),
    )
    return cfg, domain, x0, grids, gmm


@pytest.mark.parametrize("model", ["cart", "omni"])
@pytest.mark.parametrize("history", ["ring", "accumulate"])
def test_fused_matches_vmapped_controller(model, history):
    cfg, domain, x0, grids, gmm = _case(model)
    cfg = cfg.replace(history=history)
    outs = {}
    for fused in (False, True):
        eng = Engine(cfg.replace(use_fused_solve=fused))
        sc = eng.init_scenarios(x0)
        phik = eng.phik_from_gmm(gmm, domain)
        world = eng.prepare_world(grids)
        us, mets, codes, dwas = [], [], [], []
        for _ in range(3):  # multi-tick: warm start + history accumulate
            sc, u, diag = eng.replan(sc, phik, world)
            us.append(np.asarray(u))
            mets.append(np.asarray(diag.ergodic_metric))
            codes.append(np.asarray(diag.collision_code))
            dwas.append(np.asarray(diag.dwa_active))
        outs[fused] = (np.stack(us), np.stack(mets), np.stack(codes),
                       np.stack(dwas), jax.tree.map(np.asarray, sc))
    u_ref, m_ref, c_ref, d_ref, sc_ref = outs[False]
    u_fus, m_fus, c_fus, d_fus, sc_fus = outs[True]
    np.testing.assert_allclose(u_fus, u_ref, atol=5e-5)
    np.testing.assert_allclose(m_fus, m_ref, rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(c_fus, c_ref)
    np.testing.assert_array_equal(d_fus, d_ref)
    np.testing.assert_allclose(sc_fus.state.U, sc_ref.state.U, atol=5e-5)
    np.testing.assert_allclose(
        sc_fus.state.buffer.states, sc_ref.state.buffer.states, atol=1e-6
    )
    # atol 5e-6: the kernel builds cos(k theta) by Chebyshev recurrence
    # (~1e-6 at K=10; solve_kernel.py section 2) vs the XLA path's direct cos
    np.testing.assert_allclose(sc_fus.state.ck_sum, sc_ref.state.ck_sum,
                               rtol=1e-5, atol=5e-6)


def test_fused_shared_history_draw_matches_vmapped():
    """shared_history_draw=True: the fused path's single shared-one-hot
    compaction GEMM must be BIT-identical to the vmapped per-scenario draws
    (which see identical RNG keys under the flag), over multiple ticks."""
    cfg, domain, x0, grids, gmm = _case("cart")
    cfg = cfg.replace(shared_history_draw=True)
    outs = {}
    for fused in (False, True):
        eng = Engine(cfg.replace(use_fused_solve=fused))
        sc = eng.init_scenarios(x0)
        phik = eng.phik_from_gmm(gmm, domain)
        world = eng.prepare_world(grids)
        us = []
        for _ in range(4):
            sc, u, diag = eng.replan(sc, phik, world)
            us.append(np.asarray(u))
        outs[fused] = (np.stack(us), jax.tree.map(np.asarray, sc))
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=5e-5)
    np.testing.assert_allclose(outs[True][1].state.U, outs[False][1].state.U,
                               atol=5e-5)
    # the draw is shared but per-scenario HISTORY CONTENT differs, so
    # controls must still differ across scenarios (no accidental collapse)
    assert not np.allclose(outs[True][0][-1][0], outs[True][0][-1][1])


@pytest.mark.parametrize("model", ["cart", "omni"])
def test_fused_shared_maps_inkernel_patch_matches_vmapped(model):
    """shared_maps=True on the fused path extracts the distance-field patch
    INSIDE the kernel from three exact bf16 chunks of the shared map
    (solve_kernel.py section 0) — controls, collision codes, and DWA
    decisions must match the vmapped controller exactly as the
    XLA-extracted patch path does, over multiple ticks with obstacles."""
    cfg, domain, x0, grids, gmm = _case(model)
    outs = {}
    for fused in (False, True):
        eng = Engine(cfg.replace(use_fused_solve=fused, shared_maps=fused))
        sc = eng.init_scenarios(x0)
        phik = eng.phik_from_gmm(gmm, domain)
        world = eng.prepare_world(grids)
        us, codes, dwas = [], [], []
        for _ in range(3):
            sc, u, diag = eng.replan(sc, phik, world)
            us.append(np.asarray(u))
            codes.append(np.asarray(diag.collision_code))
            dwas.append(np.asarray(diag.dwa_active))
        outs[fused] = (np.stack(us), np.stack(codes), np.stack(dwas))
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=5e-5)
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    np.testing.assert_array_equal(outs[True][2], outs[False][2])


def test_fused_shared_maps_sharded_matches_unsharded():
    """The in-kernel extraction path must also compile and match on a
    scenario mesh (the shared map is read as dist[0] of a sharded batch)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from ergodic_exploration_tpu.engine import make_scenario_mesh

    cfg, domain, x0, grids, gmm = _case("cart", S=16)
    cfg = cfg.replace(use_fused_solve=True, shared_maps=True)
    outs = {}
    for mesh in (None, make_scenario_mesh(8)):
        eng = Engine(cfg, mesh=mesh)
        sc = eng.init_scenarios(x0)
        phik = eng.phik_from_gmm(gmm, domain)
        world = eng.prepare_world(grids)
        sc, u, diag = eng.replan(sc, phik, world)
        outs[mesh is None] = (np.asarray(u), np.asarray(diag.collision_code))
    np.testing.assert_allclose(outs[False][0], outs[True][0],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(outs[False][1], outs[True][1])


@pytest.mark.parametrize("shared", [False, True])
def test_fused_empty_world_and_boundary(shared):
    """Obstacle-free world (FAR distance field) + a start near the boundary:
    the boundary barrier path and the FAR plateau must match too — on both
    the XLA-extracted-patch and the in-kernel shared-map extraction paths
    (the latter must reconstruct FAR == 1e6 exactly from the bf16 chunks
    so the gradient zeroing applies)."""
    cfg = default_config("cart").replace(num_basis=5, buffer_capacity=32)
    domain = Domain.create(0.0, 0.0, 2.0, 2.0)
    S = 8
    x0 = np.array(
        [[0.08, 0.1, 2.5], [1.9, 1.92, -0.5], [1.0, 0.05, 3.0], [0.1, 1.9, 0.1],
         [0.5, 0.5, 1.0], [1.5, 1.5, -2.0], [1.0, 1.0, 0.0], [0.2, 1.0, -1.0]],
        np.float32,
    )
    gmm = target_ops.GaussianMixture.create(
        means=np.tile(np.array([[1.0, 1.0]], np.float32)[None], (S, 1, 1)),
        covs=np.tile((0.15 * np.eye(2, dtype=np.float32))[None, None], (S, 1, 1, 1)),
        weights=np.ones((S, 1), np.float32),
    )
    outs = {}
    for fused in (False, True):
        eng = Engine(cfg.replace(use_fused_solve=fused,
                                 shared_maps=fused and shared))
        sc = eng.init_scenarios(x0)
        phik = eng.phik_from_gmm(gmm, domain)
        world = eng.empty_world(domain, S)
        sc, u, diag = eng.replan(sc, phik, world)
        outs[fused] = (np.asarray(u), np.asarray(diag.barrier_cost))
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=5e-5)
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-5, atol=1e-7)


def test_fused_explore_matches_vmapped():
    """The on-device closed loop (Engine.explore) with the fused core must
    track the vmapped loop: same trajectories and controls over 3 ticks."""
    cfg, domain, x0, grids, gmm = _case("cart", S=8)
    outs = {}
    for fused in (False, True):
        eng = Engine(cfg.replace(use_fused_solve=fused))
        sc = eng.init_scenarios(x0)
        phik = eng.phik_from_gmm(gmm, domain)
        world = eng.prepare_world(grids)
        out = eng.explore(sc, phik, world, n_ticks=3)
        outs[fused] = (np.asarray(out.trajectory), np.asarray(out.controls))
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=5e-5)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=5e-5)


def test_in_kernel_refresh_tick_matches_two_stage():
    """Round-4 one-kernel tick: replan_refresh with the GMM target refresh
    folded INTO the merged Pallas kernel (shared_maps + shared domain) must
    match the unfused two-stage path (per-scenario masked XLA refresh +
    vmapped controller) over a multi-tick closed batch — the full SURVEY
    section-4.2 tick as one program."""
    cfg, domain, x0, grids, gmm = _case("cart")
    base = cfg.replace(shared_history_draw=True)
    outs = {}
    for one_kernel in (False, True):
        eng = Engine(base.replace(use_fused_solve=one_kernel,
                                  shared_maps=one_kernel))
        sc = eng.init_scenarios(x0)
        world = eng.prepare_world(grids)
        us, mets, codes = [], [], []
        for _ in range(3):
            sc, u, diag = eng.replan_refresh(sc, gmm, domain, world)
            us.append(np.asarray(u))
            mets.append(np.asarray(diag.ergodic_metric))
            codes.append(np.asarray(diag.collision_code))
        outs[one_kernel] = (np.stack(us), np.stack(mets), np.stack(codes))
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=5e-5)
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-4)
    np.testing.assert_array_equal(outs[True][2], outs[False][2])


def test_in_kernel_refresh_sharded_matches_unsharded():
    """Round 5: the one-kernel tick (in-kernel GMM refresh) un-gated on
    meshes — replan_refresh on an 8-device scenario mesh must run the SAME
    one-kernel program under shard_map and match the single-device path
    (VERDICT r4 weak 2: the benched flagship program gets a multi-device
    twin)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from ergodic_exploration_tpu.engine import make_scenario_mesh

    cfg, domain, x0, grids, gmm = _case("cart", S=16)
    base = cfg.replace(use_fused_solve=True, shared_maps=True,
                       shared_history_draw=True)
    outs = {}
    for mesh in (None, make_scenario_mesh(8)):
        eng = Engine(base, mesh=mesh)
        sc = eng.init_scenarios(x0)
        world = eng.prepare_world(grids)
        us, codes = [], []
        for _ in range(2):
            sc, u, diag = eng.replan_refresh(sc, gmm, domain, world)
            us.append(np.asarray(u))
            codes.append(np.asarray(diag.collision_code))
        outs[mesh is None] = (np.stack(us), np.stack(codes))
    np.testing.assert_allclose(outs[False][0], outs[True][0],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(outs[False][1], outs[True][1])


def test_in_kernel_refresh_unmasked_empty_world():
    """One-kernel tick on an obstacle-free world (free_mask None): the
    UNMASKED in-kernel normalizer branch must match the two-stage path."""
    cfg, domain, x0, grids, gmm = _case("cart")
    base = cfg.replace(shared_history_draw=True, enable_safety=False)
    S = x0.shape[0]
    outs = {}
    for one_kernel in (False, True):
        eng = Engine(base.replace(use_fused_solve=one_kernel,
                                  shared_maps=one_kernel))
        sc = eng.init_scenarios(x0)
        world = eng.empty_world(domain, S)
        sc, u, diag = eng.replan_refresh(sc, gmm, domain, world)
        outs[one_kernel] = (np.asarray(u), np.asarray(diag.ergodic_metric))
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=5e-5)
    np.testing.assert_allclose(outs[True][1], outs[False][1], rtol=1e-4)


def test_in_kernel_refresh_degenerate_mask_fallback():
    """A fully-occupied shared map (masked phi underflows to ~0 everywhere)
    must fall back to uniform-over-mask IDENTICALLY in-kernel and on the
    XLA fold path (engine._renorm parity; VERDICT r2 weak 6 lineage)."""
    cfg, domain, x0, grids, gmm = _case("cart")
    base = cfg.replace(shared_history_draw=True)
    S = x0.shape[0]
    # GMM far outside the domain -> phi underflows on every free cell
    far_gmm = target_ops.GaussianMixture.create(
        means=np.full((S, 2, 2), 80.0, np.float32),
        covs=np.tile((0.05 * np.eye(2, dtype=np.float32))[None, None], (S, 2, 1, 1)),
        weights=np.ones((S, 2), np.float32),
    )
    outs = {}
    for one_kernel in (False, True):
        eng = Engine(base.replace(use_fused_solve=one_kernel,
                                  shared_maps=one_kernel))
        sc = eng.init_scenarios(x0)
        world = eng.prepare_world(grids)
        sc, u, diag = eng.replan_refresh(sc, far_gmm, domain, world)
        outs[one_kernel] = np.asarray(u)
    np.testing.assert_allclose(outs[True], outs[False], atol=5e-5)


def test_lazy_dwa_matches_eager_where_active():
    """lazy_dwa (tile-predicated sweep skip) == eager on everything that is
    NOT a documented don't-care: emitted controls, collision codes,
    dwa_active, and u_dwa/feasible ON ACTIVE LANES. Built so one scenario
    tile is crash-free (sweep skipped under lazy) and another crashes."""
    import ergodic_exploration_tpu.ops.solve_kernel as sk

    S = 16  # tile 8 on CPU fallback -> two tiles
    cfg = default_config("cart").replace(
        num_basis=6, buffer_capacity=64, use_fused_solve=True)
    domain = Domain.create(0.0, 0.0, 3.0, 3.0)
    rng = np.random.default_rng(5)
    x0 = np.zeros((S, 3), np.float32)
    x0[:8, 0] = rng.uniform(0.4, 1.0, 8)  # far from the wall: no crashes
    x0[:8, 1] = rng.uniform(0.4, 1.0, 8)
    x0[8:, 0] = rng.uniform(1.0, 2.4, 8)  # jammed against the wall
    x0[8:, 1] = 1.45
    x0[:, 2] = rng.uniform(-np.pi, np.pi, S)
    data = np.zeros((60, 60), np.float32)
    data[28:32, 12:48] = 1.0
    grids = GridMap(
        data=jnp.broadcast_to(jnp.asarray(data), (S, 60, 60)),
        origin=jnp.zeros((S, 2), jnp.float32),
        resolution=jnp.full((S,), 0.05, jnp.float32),
    )
    gmm = target_ops.GaussianMixture.create(
        means=rng.uniform(0.5, 2.5, (S, 2, 2)).astype(np.float32),
        covs=np.tile((0.2 * np.eye(2, dtype=np.float32))[None, None],
                     (S, 2, 1, 1)),
        weights=np.ones((S, 2), np.float32),
    )

    orig = sk.params_from_config
    outs = {}
    for lazy in (False, True):
        def patched(c, _lazy=lazy):
            return dataclasses.replace(orig(c), lazy_dwa=_lazy)

        sk.params_from_config = patched
        try:
            eng = Engine(cfg)
            sc = eng.init_scenarios(x0)
            phik = eng.phik_from_gmm(gmm, domain)
            world = eng.prepare_world(grids)
            sc, u, diag = eng.replan(sc, phik, world)
            outs[lazy] = (np.asarray(u), np.asarray(diag.collision_code),
                          np.asarray(diag.dwa_active),
                          np.asarray(diag.dwa_feasible))
        finally:
            sk.params_from_config = orig

    (u_e, code_e, act_e, feas_e), (u_l, code_l, act_l, feas_l) = (
        outs[False], outs[True])
    assert act_e.any() and not act_e.all(), "need mixed crash/no-crash tiles"
    np.testing.assert_array_equal(code_l, code_e)
    np.testing.assert_array_equal(act_l, act_e)
    np.testing.assert_allclose(u_l, u_e, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(feas_l[act_l], feas_e[act_e])


def test_fused_orbit_guard_matches_vmapped():
    """Round 5: the orbit guard (warm-start reset on closed orbits) must
    fire identically on the fused path — including the shared-draw
    piggyback read — and on the vmapped controller. Scenario 0 is doctored
    into a saturated orbit (full buffer at one spot, curled U); scenario 1
    keeps a healthy straight history."""
    cfg, domain, x0, grids, gmm = _case("cart", S=8)
    cfg = cfg.replace(shared_history_draw=True)
    outs = {}
    for fused in (False, True):
        eng = Engine(cfg.replace(use_fused_solve=fused, shared_maps=fused))
        sc = eng.init_scenarios(x0)
        cap = cfg.buffer_capacity
        # all scenarios: full buffer (counts must stay uniform under the
        # shared-draw contract); scenario 0 parked at its pose, others on a
        # straight line through theirs
        states = np.zeros((8, 2, cap), np.float32)
        states[0] = x0[0, :2][:, None]
        for s in range(1, 8):
            states[s, 0] = x0[s, 0] + np.linspace(-1.0, 0.0, cap)
            states[s, 1] = x0[s, 1]
        buf = sc.state.buffer._replace(
            states=jnp.asarray(states),
            cursor=jnp.zeros((8,), jnp.int32),
            count=jnp.full((8,), cap, jnp.int32),
        )
        U = jnp.asarray(
            np.tile(np.array([[1.0, -1.0]], np.float32), (cfg.horizon, 1))
        )[None].repeat(8, 0)
        sc = sc._replace(state=sc.state._replace(buffer=buf, U=U))
        phik = eng.phik_from_gmm(gmm, domain)
        world = eng.prepare_world(grids)
        sc2, u, diag = eng.replan(sc, phik, world)
        outs[fused] = (np.asarray(u), np.asarray(diag.orbit_reset))
    assert outs[True][1][0] and not outs[True][1][1:].any()
    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=5e-5)
