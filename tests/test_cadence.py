"""Adaptive rebuild-cadence ladder: every distinct cadence compiles its
own chunk program (static scan length), so the adaptive logic must move
on a bounded set with hysteresis (BENCH_NOTES round 3: the +2-walk
recovery minted programs mid-measurement and burned a bench window in
XLA compiles)."""

import jax
import numpy as np

from sevennet_exp_tpu.md.engine import MolecularDynamics
from sevennet_exp_tpu.model.build import build_e3_equivariant_model

from samples import rattled_rocksalt, tiny_model_config


def _md(rebuild_every=20):
    config = tiny_model_config({'cutoff': 3.5, 'channel': 4, 'lmax': 1,
                                'num_convolution_layer': 2})
    model = build_e3_equivariant_model(config)
    params, _ = model.init(jax.random.PRNGKey(1))
    at = rattled_rocksalt(reps=2, a=5.2, rattle=0.05, seed=3)
    return MolecularDynamics(
        model, params, at, dt_fs=1.0, temperature_K=100.0,
        ensemble='nvt', rebuild_every=rebuild_every, seed=0,
    )


def test_cadence_ladder_bounded_and_contains_initial():
    md = _md(rebuild_every=20)
    ladder = md._cadence_ladder()
    assert ladder == sorted(set(ladder))
    assert 20 in ladder and ladder[0] == 1
    assert all(k <= 20 for k in ladder)
    # a non-ladder initial cadence still appears as the top rung
    md2 = _md(rebuild_every=7)
    assert md2._cadence_ladder()[-1] == 7


def test_snap_cadence_rounds_down_to_ladder():
    md = _md(rebuild_every=20)
    for k, want in [(20, 20), (19, 16), (9, 8), (7, 6), (1, 1), (0, 1)]:
        assert md._snap_cadence(k) == want, (k, want)


def test_staleness_adjustment_lands_on_ladder():
    md = _md(rebuild_every=20)
    ladder = set(md._cadence_ladder())
    # synthetic postprocess inputs: worst displacement far beyond the
    # bound must shrink the cadence onto a ladder rung
    metrics = {
        'overflow': np.array([False]),
        'overflow_deg': np.array([False]),
        'overflow_bin': np.array([False]),
        'max_disp2': np.array([(10.0 * md.md_buffer) ** 2]),
        'energy': np.array([0.0]),
        'temperature': np.array([100.0]),
    }
    out = md._postprocess_dispatch(md.state, metrics, 1)
    assert out is None  # adjustment invalidates the attempt
    assert md.rebuild_every in ladder
    assert md.rebuild_every < 20


def test_recovery_steps_one_rung_with_hysteresis():
    md = _md(rebuild_every=20)
    md.rebuild_every = 6
    quiet = {
        'overflow': np.array([False]),
        'overflow_deg': np.array([False]),
        'overflow_bin': np.array([False]),
        # just under the 0.35x-bound hysteresis threshold
        'max_disp2': np.array([(0.3 * 0.5 * md.md_buffer) ** 2]),
        'energy': np.array([0.0]),
        'temperature': np.array([100.0]),
    }
    md._postprocess_dispatch(md.state, dict(quiet), 1)
    assert md.rebuild_every == 8  # one rung up, not +2
    # borderline displacement (above hysteresis, below bound): hold
    md.rebuild_every = 6
    hold = dict(quiet)
    hold['max_disp2'] = np.array([(0.8 * 0.5 * md.md_buffer) ** 2])
    md._postprocess_dispatch(md.state, hold, 1)
    assert md.rebuild_every == 6


def test_watchdog_two_strike_and_recovery():
    """Dispatch watchdog (engine._watchdog): a warm signature must
    exceed the budget TWICE CONSECUTIVELY before any back-off (one
    transient relay stall degraded the whole round-4 driver bench),
    back-offs land in the event log with their reason, and a
    dyn-capped engine running well under budget earns its chunk count
    back."""
    md = _md(rebuild_every=20)
    budget = 30.0
    md._chunk_key = ('k',)

    # first sighting of the signature: compile-laden, never counted
    md._watchdog(4, elapsed=100.0, budget=budget)
    assert getattr(md, '_dyn_outer_cap', None) is None
    assert md.dispatch_events == []

    # strike 1 on the now-warm signature: logged, no action
    md._watchdog(4, elapsed=100.0, budget=budget)
    assert getattr(md, '_dyn_outer_cap', None) is None
    assert md.dispatch_events[-1]['action'] == 'strike'

    # a good execution in between resets the strike counter
    md._watchdog(4, elapsed=1.0, budget=budget)
    md._watchdog(4, elapsed=100.0, budget=budget)
    assert getattr(md, '_dyn_outer_cap', None) is None

    # two consecutive over-budget executions: halve
    md._watchdog(4, elapsed=100.0, budget=budget)
    assert md._dyn_outer_cap == 2
    assert md.dispatch_events[-1]['action'] == 'halve_chunks_to_2'

    # recovery: dispatches at the cap, well under budget, double back
    md._watchdog(2, elapsed=1.0, budget=budget)  # first: warms sig
    md._watchdog(2, elapsed=1.0, budget=budget)
    assert md._dyn_outer_cap == 4
    assert md.dispatch_events[-1]['action'] == 'recover_chunks_to_4'

    rep = md.dispatch_report()
    assert rep['n_dispatches'] == 7
    assert rep['dyn_outer_cap'] == 4
    assert rep['stepwise_forced'] is False
    assert rep['step_s_min'] <= rep['step_s_med'] <= rep['step_s_max']


def test_watchdog_stepwise_at_one_chunk():
    md = _md(rebuild_every=20)
    md._chunk_key = ('k',)
    for _ in range(3):
        md._watchdog(1, elapsed=100.0, budget=30.0)
    assert md.stepwise_threshold == md.n
    assert md.dispatch_events[-1]['action'] in (
        'force_stepwise', 'already_stepwise')
