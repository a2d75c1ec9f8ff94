"""SMC sampler tests: moment recovery on analytic targets and evidence
estimation (NEW capability relative to the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mellon_tpu.inference.smc import run_smc, smc_density_posterior


def test_smc_recovers_gaussian_posterior():
    """Prior N(0,1)², likelihood N(z; m, s²I) -> analytic posterior."""
    m = jnp.asarray([1.0, -0.5])
    s2 = 0.5

    def loglik(z):
        return -0.5 * jnp.sum((z - m) ** 2) / s2

    res = run_smc(
        loglik, 2, jax.random.PRNGKey(0), num_particles=2048,
        num_mutation_steps=5,
    )
    # posterior: precision = 1 + 1/s2, mean = (m/s2) / (1 + 1/s2)
    post_prec = 1 + 1 / s2
    post_mean = (np.asarray(m) / s2) / post_prec
    post_std = 1 / np.sqrt(post_prec)
    particles = np.asarray(res.particles)
    np.testing.assert_allclose(particles.mean(axis=0), post_mean, atol=0.08)
    np.testing.assert_allclose(particles.std(axis=0), post_std, rtol=0.15)
    assert res.betas[-1] == 1.0


def test_smc_log_evidence():
    """Evidence of conjugate Gaussian model is analytic."""
    m = jnp.asarray([2.0])
    s2 = 1.0

    def loglik(z):
        return -0.5 * jnp.sum((z - m) ** 2) / s2 - 0.5 * jnp.log(
            2 * jnp.pi * s2
        )

    res = run_smc(
        loglik, 1, jax.random.PRNGKey(1), num_particles=4096,
        num_mutation_steps=5,
    )
    # evidence = N(m; 0, (1+s2) I)
    expected = -0.5 * float(m[0]) ** 2 / (1 + s2) - 0.5 * np.log(
        2 * np.pi * (1 + s2)
    )
    assert float(res.log_evidence) == pytest.approx(expected, abs=0.1)


def test_smc_density_posterior_matches_map():
    from mellon_tpu import DensityEstimator

    x = jax.random.normal(jax.random.PRNGKey(2), (40, 2))
    est = DensityEstimator()
    est.prepare_inference(x)
    est.run_inference()
    ld_map = np.asarray(est.process_inference(build_predict=False))

    res, f_samples = smc_density_posterior(
        est, num_particles=512, seed=3, num_mutation_steps=5
    )
    f_mean = np.asarray(f_samples.mean(axis=0))
    assert np.corrcoef(f_mean, ld_map)[0, 1] > 0.9


def test_smc_one_sided_custom_prior_raises():
    """Supplying only one of prior_sample/prior_logpdf would silently
    target the default N(0, I) prior, biasing posterior and evidence;
    it must raise instead."""
    import pytest
    from mellon_tpu.inference.smc import run_smc

    def loglik(z):
        return -0.5 * jnp.sum(z**2)

    with pytest.raises(ValueError, match="BOTH prior_sample and prior_logpdf"):
        run_smc(
            loglik, 2, jax.random.PRNGKey(0), num_particles=8,
            prior_sample=lambda k, n: jax.random.normal(k, (n, 2)),
        )
    with pytest.raises(ValueError, match="BOTH prior_sample and prior_logpdf"):
        run_smc(
            loglik, 2, jax.random.PRNGKey(0), num_particles=8,
            prior_logpdf=lambda z: -0.5 * jnp.sum(z**2),
        )


def test_smc_sharded_matches_single_device_moments():
    """SMC with particles sharded over the virtual mesh recovers the same
    analytic posterior and evidence as the unsharded run (the resampling
    gather and ESS/evidence reductions become collectives)."""
    from mellon_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    mesh = create_mesh(n_chains=8, n_cells=1)

    m = jnp.asarray([1.0, -0.5])
    s2 = 0.5

    def loglik(z, mean):
        return -0.5 * jnp.sum((z - mean) ** 2) / s2 - jnp.log(
            2 * jnp.pi * s2
        )

    res = run_smc(
        loglik, 2, jax.random.PRNGKey(4), num_particles=2048,
        num_mutation_steps=5, loglik_args=(m,), mesh=mesh,
    )
    post_prec = 1 + 1 / s2
    post_mean = (np.asarray(m) / s2) / post_prec
    post_std = 1 / np.sqrt(post_prec)
    particles = np.asarray(res.particles)
    np.testing.assert_allclose(particles.mean(axis=0), post_mean, atol=0.08)
    np.testing.assert_allclose(particles.std(axis=0), post_std, rtol=0.15)
    assert res.betas[-1] == 1.0

    # evidence agrees with the unsharded run of the same model
    res_local = run_smc(
        loglik, 2, jax.random.PRNGKey(4), num_particles=2048,
        num_mutation_steps=5, loglik_args=(m,),
    )
    assert float(res.log_evidence) == pytest.approx(
        float(res_local.log_evidence), abs=0.15
    )


def test_smc_stage_lowers_to_collectives():
    """The compiled sharded tempering stage must contain collective ops —
    the docstring's claim ("the ESS reduction and resampling gather become
    collectives", mellon_tpu/inference/smc.py) verified at the HLO level,
    like the mcmc all-reduce test (SURVEY.md §5.8)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mellon_tpu.inference.smc import _smc_stage
    from mellon_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    mesh = create_mesh(n_chains=8, n_cells=1)
    sharding = NamedSharding(mesh, P("chains", None))

    num_particles, dim = 64, 2
    particles = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (num_particles, dim)),
        sharding,
    )

    def loglik(z):
        return -0.5 * jnp.sum(z**2)

    def prior_logpdf(z):
        return -0.5 * jnp.sum(z**2)

    lowered = _smc_stage.lower(
        loglik,
        prior_logpdf,
        particles,
        jax.random.PRNGKey(1),
        jnp.asarray(0.0),
        jnp.asarray(0.3),
        jnp.asarray(num_particles / 2.0),
        jnp.asarray(0.01),
        2,
        3,
    )
    hlo = lowered.compile().as_text()
    assert any(
        op in hlo for op in ("all-reduce", "all-gather", "all-to-all")
    ), "sharded SMC stage compiled without any collective op"


def test_smc_combined_particle_and_cell_sharding():
    """Particles on the chains axis combined with cell-sharded likelihood
    operands: the density-model layout of SURVEY.md §5.8 end to end."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mellon_tpu import DensityEstimator
    from mellon_tpu.inference.smc import loglik_from_loss
    from mellon_tpu.parallel.mesh import CELL_AXIS, create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    mesh = create_mesh(n_chains=2, n_cells=4)

    x = jax.random.normal(jax.random.PRNGKey(5), (64, 2))
    est = DensityEstimator()
    est.prepare_inference(x)
    est.run_inference()
    ld_map = np.asarray(est.process_inference(build_predict=False))

    L, nn, d, mu = est._loss_args
    Ls = jax.device_put(L, NamedSharding(mesh, P(CELL_AXIS, None)))
    nns = jax.device_put(nn, NamedSharding(mesh, P(CELL_AXIS)))
    loglik = loglik_from_loss(est._loss_fn)

    res = run_smc(
        loglik,
        int(est.initial_value.shape[0]),
        jax.random.PRNGKey(6),
        num_particles=512,
        num_mutation_steps=5,
        loglik_args=(Ls, nns, d, mu),
        mesh=mesh,
    )
    f = jax.vmap(est.transform)(res.particles)
    f_mean = np.asarray(f.mean(axis=0))
    assert np.corrcoef(f_mean, ld_map)[0, 1] > 0.9


def test_next_beta_respects_schedule_floor():
    """On sharply peaked likelihoods the admissible tempering increment
    falls below one f32 ulp of beta; the bisection must still advance
    beta by at least the schedule floor (remaining gap / stages left)
    instead of stalling the sweep at a fixed temperature."""
    from mellon_tpu.inference.smc import _next_beta

    # log-lik spread so large that keeping ESS above target requires
    # delta << f32 eps — the admissible increment rounds away in f32
    log_lik = jnp.asarray(
        np.linspace(0.0, -1e8, 256), dtype=jnp.float32
    )
    beta = jnp.asarray(0.5, dtype=jnp.float32)
    target = jnp.asarray(128.0, dtype=jnp.float32)
    floor = jnp.asarray(0.5 / 50, dtype=jnp.float32)  # 50 stages left
    new_beta = _next_beta(log_lik, beta, target, floor)
    assert new_beta.dtype == jnp.float32
    # the forced step is exactly the floor (ESS would prefer ~0)
    assert float(new_beta) == pytest.approx(0.5 + 0.5 / 50, rel=1e-6)
    # a whole-gap floor lands on exactly 1.0 (no f32 round-below leak)
    new_beta = _next_beta(log_lik, beta, target, jnp.asarray(0.5, jnp.float32))
    assert float(new_beta) == 1.0


def test_smc_terminates_at_beta_one_on_peaked_posterior():
    """A sharply peaked likelihood (posterior std ~0.03 vs prior std 1)
    genuinely needs many tempering stages; the schedule floor guarantees
    beta reaches EXACTLY 1 within max_stages, the final population still
    tracks the analytic posterior, and the last stage's actual
    pre-resampling weights are surfaced for terminal-ESS diagnosis."""
    m = jnp.asarray([1.5, -0.8, 0.4])
    s2 = 1e-3  # peaked: each unit of beta reweights by exp(-|z-m|^2/2e-3)

    def loglik(z):
        return -0.5 * jnp.sum((z - m) ** 2) / s2

    res = run_smc(
        loglik, 3, jax.random.PRNGKey(7), num_particles=1024,
        num_mutation_steps=5, max_stages=60,
    )
    assert res.betas[-1] == 1.0
    assert len(res.betas) <= 60
    post_prec = 1 + 1 / s2
    post_mean = (np.asarray(m) / s2) / post_prec
    post_std = 1 / np.sqrt(post_prec)
    particles = np.asarray(res.particles)
    assert np.all(np.isfinite(particles))
    np.testing.assert_allclose(particles.mean(axis=0), post_mean, atol=0.02)
    np.testing.assert_allclose(particles.std(axis=0), post_std, rtol=0.35)
    # surfaced terminal diagnostics: real weights, not placeholder zeros
    w = np.asarray(res.final_stage_log_weights)
    assert w.shape == (1024,)
    norm = w - np.log(np.sum(np.exp(w - w.max()))) - w.max()
    terminal_ess = 1.0 / np.sum(np.exp(2 * norm))
    assert 1.0 <= terminal_ess <= 1024.0
    assert terminal_ess == pytest.approx(res.ess_history[-1], rel=1e-3)


def test_systematic_resample_indices_always_in_range():
    """The f32 cumsum of normalized weights can end below the last
    systematic position (~1 - 3e-7 at 256 particles); searchsorted then
    returns num_particles — an out-of-bounds gather index that jnp.take
    silently fills with NaN (observed: NaN particles/ESS/evidence on the
    100k-cell SMC bench).  Indices must be clamped into range for every
    draw of the positioning uniform."""
    from mellon_tpu.inference.smc import _systematic_resample

    P = 256
    # realistic spread weights (the failing case: dbeta * log_lik)
    log_w = jnp.asarray(
        np.linspace(-21651.0, -21194.0, P)[np.random.RandomState(0).permutation(P)],
        dtype=jnp.float32,
    )

    @jax.jit
    def max_idx(key):
        return jnp.max(_systematic_resample(key, log_w, P))

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(20000))
    worst = int(jnp.max(jax.vmap(max_idx)(keys)))
    assert worst <= P - 1

    # and with fully-degenerate weights (single surviving particle)
    log_w2 = jnp.full((P,), -jnp.inf).at[3].set(0.0)
    idx = _systematic_resample(jax.random.PRNGKey(1), log_w2, P)
    assert int(jnp.max(idx)) <= P - 1
    np.testing.assert_array_equal(np.asarray(idx), np.full(P, 3))


def test_smc_finite_evidence_on_large_peaked_model():
    """Evidence and ESS history stay finite on a larger density-model
    posterior where forced tempering steps and particle degeneracy are
    routine (regression for the resampling NaN)."""
    from mellon_tpu.inference.losses import density_loss
    from mellon_tpu.inference.smc import loglik_from_loss, run_smc

    n, m, P = 5000, 64, 128
    key = jax.random.PRNGKey(0)
    L = jax.random.normal(key, (n, m)) / jnp.sqrt(m)
    nn = 0.05 + 0.3 * jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    loglik = loglik_from_loss(density_loss)
    res = run_smc(
        loglik, m, jax.random.PRNGKey(2), num_particles=P,
        num_mutation_steps=3, num_leapfrog_steps=4, max_stages=30,
        loglik_args=(L, nn, jnp.asarray(20.0), jnp.asarray(-10.0)),
    )
    assert res.betas[-1] == 1.0
    assert np.isfinite(float(res.log_evidence))
    assert np.isfinite(np.asarray(res.ess_history)).all()
    assert np.isfinite(np.asarray(res.particles)).all()


def test_smc_laplace_start_matches_prior_start():
    """start='laplace' anneals from the diagonal-Laplace Gaussian with the
    adjusted likelihood — the β=1 target and the evidence estimate are the
    SAME posterior/normalizer as the prior start, but the sweep is short
    and well-mixed.  Verified on a density model against the prior-start
    run and the MAP."""
    from mellon_tpu import DensityEstimator
    from mellon_tpu.inference.smc import smc_density_posterior

    x = jax.random.normal(jax.random.PRNGKey(2), (60, 2))
    est = DensityEstimator()
    est.prepare_inference(x)
    est.run_inference()
    ld_map = np.asarray(est.process_inference(build_predict=False))

    res_l, f_l = smc_density_posterior(
        est, num_particles=512, seed=3, num_mutation_steps=5, start="laplace"
    )
    res_p, f_p = smc_density_posterior(
        est, num_particles=512, seed=3, num_mutation_steps=5, start="prior"
    )
    assert res_l.betas[-1] == 1.0
    # annealing from the Laplace approximation needs far fewer stages
    assert len(res_l.betas) <= len(res_p.betas)
    f_mean_l = np.asarray(f_l.mean(axis=0))
    f_mean_p = np.asarray(f_p.mean(axis=0))
    assert np.corrcoef(f_mean_l, ld_map)[0, 1] > 0.9
    assert np.corrcoef(f_mean_l, f_mean_p)[0, 1] > 0.95
    # same normalizing constant (within MC error of both estimators)
    assert float(res_l.log_evidence) == pytest.approx(
        float(res_p.log_evidence), abs=2.0
    )


def test_smc_density_posterior_unknown_start_raises():
    from mellon_tpu import DensityEstimator
    from mellon_tpu.inference.smc import smc_density_posterior

    x = jax.random.normal(jax.random.PRNGKey(2), (40, 2))
    est = DensityEstimator()
    est.prepare_inference(x)
    est.run_inference()
    with pytest.raises(ValueError, match="Unknown start option"):
        smc_density_posterior(est, num_particles=8, start="bogus")


def test_estimator_smc_laplace_start_option():
    """sampler_options={'start': 'laplace'} on optimizer='smc' fits via the
    Laplace-started sweep; invalid values are rejected at construction."""
    from mellon_tpu import DensityEstimator

    x = jax.random.normal(jax.random.PRNGKey(8), (50, 2))
    ref = DensityEstimator(n_landmarks=20).fit_predict(x)
    est = DensityEstimator(
        n_landmarks=20, optimizer="smc",
        sampler_options={"num_particles": 256, "start": "laplace"},
    )
    ld = est.fit_predict(x)
    assert np.all(np.isfinite(np.asarray(ld)))
    assert np.corrcoef(np.asarray(ld), np.asarray(ref))[0, 1] > 0.9
    assert est.smc_result.betas[-1] == 1.0

    with pytest.raises(ValueError, match="must be one of"):
        DensityEstimator(optimizer="smc", sampler_options={"start": "warm"})


def test_laplace_start_reports_clipped_sigma(caplog):
    """A flat Hessian direction produces a huge Laplace std that
    laplace_start clips into [LAPLACE_SIGMA_MIN, LAPLACE_SIGMA_MAX]; the
    clipping must be surfaced (warning above the fraction threshold), and
    the resulting q must still be usable (finite samples and logpdf)."""
    import logging

    from mellon_tpu.inference.smc import (
        LAPLACE_SIGMA_MAX,
        LAPLACE_SIGMA_MIN,
        laplace_start,
    )

    # dim 0/1: unit curvature; dim 2: intentionally flat (no z2 term);
    # dim 3: extremely sharp curvature -> std below the lower clip
    def loss(z):
        return (
            0.5 * z[0] ** 2
            + 0.5 * z[1] ** 2
            + 0.0 * z[2]
            + 0.5e8 * z[3] ** 2
        )

    logger = logging.getLogger("mellon_tpu")
    logger.propagate = True
    try:
        with caplog.at_level(logging.INFO, logger="mellon_tpu"):
            adjusted, prior_kwargs = laplace_start(
                loss, (), jnp.zeros(4), z_map=jnp.zeros(4)
            )
    finally:
        logger.propagate = False
    clip_msgs = [
        r for r in caplog.records if "clipping" in r.message.lower()
    ]
    assert clip_msgs, "laplace_start did not report the clipped std entries"
    # 2 of 4 directions clipped (50%) -> warning level
    assert any(r.levelno >= logging.WARNING for r in clip_msgs)
    assert "2 of 4" in clip_msgs[-1].message

    samples = prior_kwargs["prior_sample"](jax.random.PRNGKey(0), 8)
    assert np.isfinite(np.asarray(samples)).all()
    # the flat direction's scale was clipped to the max, not 1e4
    assert float(samples[:, 2].std()) < 3 * LAPLACE_SIGMA_MAX
    lp = prior_kwargs["prior_logpdf"](samples[0])
    assert np.isfinite(float(lp))
    assert np.isfinite(float(adjusted(samples[0])))
    assert LAPLACE_SIGMA_MIN == pytest.approx(1e-3)


def test_smc_auto_start_scale_threshold(monkeypatch, caplog):
    """start='auto' (the default) resolves to 'prior' below
    SMC_LAPLACE_AUTO_N likelihood terms and 'laplace' above — at scale the
    degenerate prior start rides the schedule floor and biases the
    evidence low (round-4 smc_p5 logs)."""
    import logging

    from mellon_tpu import DensityEstimator
    from mellon_tpu.inference import smc as smc_mod

    x = jax.random.normal(jax.random.PRNGKey(2), (40, 2))
    est = DensityEstimator()
    est.prepare_inference(x)
    est.run_inference()

    logger = logging.getLogger("mellon_tpu")
    logger.propagate = True
    try:
        with caplog.at_level(logging.INFO, logger="mellon_tpu"):
            smc_mod.smc_density_posterior(
                est, num_particles=64, seed=0, num_mutation_steps=2
            )
            resolved_small = [
                r.message for r in caplog.records
                if "start='auto' resolved" in r.message
            ]
            caplog.clear()
            monkeypatch.setattr(smc_mod, "SMC_LAPLACE_AUTO_N", 10)
            smc_mod.smc_density_posterior(
                est, num_particles=64, seed=0, num_mutation_steps=2
            )
            resolved_big = [
                r.message for r in caplog.records
                if "start='auto' resolved" in r.message
            ]
    finally:
        logger.propagate = False
    assert resolved_small and "'prior'" in resolved_small[0]
    assert resolved_big and "'laplace'" in resolved_big[0]


def test_smc_evidence_error_bar_across_sweeps():
    """num_sweeps>1 returns the across-sweep mean evidence with its
    standard deviation attached (the stated uncertainty; VERDICT r4 #8)."""
    from mellon_tpu import DensityEstimator
    from mellon_tpu.inference.smc import smc_density_posterior

    x = jax.random.normal(jax.random.PRNGKey(2), (40, 2))
    est = DensityEstimator()
    est.prepare_inference(x)
    est.run_inference()

    res, f_samples = smc_density_posterior(
        est, num_particles=256, seed=0, num_mutation_steps=3, num_sweeps=3
    )
    assert res.log_evidence_std is not None
    assert np.isfinite(res.log_evidence_std)
    assert np.isfinite(float(res.log_evidence))
    # independent sweeps of a 256-particle SMC agree to a few nats here
    assert res.log_evidence_std < 5.0
    assert f_samples.shape[0] == 256

    res1, _ = smc_density_posterior(
        est, num_particles=256, seed=0, num_mutation_steps=3, num_sweeps=1
    )
    assert res1.log_evidence_std is None
    # single sweep with the same seed reproduces sweep 0 of the replicated
    # run (fold_in(key, 0) stream)
    assert np.isfinite(float(res1.log_evidence))
