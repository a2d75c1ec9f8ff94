"""On-device optimizers: L-BFGS and adam, fully jit-compiled.

Replaces the reference's host-side optimizer stack
(``mellon/inference.py:222-288``): jaxopt.ScipyMinimize dispatched scipy's
Fortran L-BFGS-B on the host with one device round-trip per function
evaluation, and ``minimize_adam`` ran a Python loop with one dispatch per
step.  Here the entire optimization — line searches included — is a single
XLA program: ``optax.lbfgs`` inside ``lax.while_loop`` and adam inside
``lax.scan``.  No host callbacks, shardable, differentiable shapes static.
"""

import logging
from collections import namedtuple
from functools import partial

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu

logger = logging.getLogger("mellon_tpu")

DEFAULT_N_ITER = 100
DEFAULT_INIT_LEARN_RATE = 1e-1
DEFAULT_OPTIMIZER = "L-BFGS-B"
DEFAULT_JIT = False

DEFAULT_LBFGS_MAX_ITER = 400
DEFAULT_LBFGS_TOL = 1e-5

Results = namedtuple("Results", "pre_transformation opt_state losses")
ResultsLoss = namedtuple("Results", "pre_transformation opt_state loss")


@partial(jax.jit, static_argnames=("loss_func", "max_iter"))
def _run_lbfgs(loss_func, initial_value, max_iter, tol, *loss_args):
    fun = (lambda z: loss_func(z, *loss_args)) if loss_args else loss_func
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=fun
        )
        params = optax.apply_updates(params, updates)
        return params, state

    def continuing(carry):
        _, state = carry
        count = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        value = otu.tree_get(state, "value")
        err = otu.tree_norm(grad)
        # loss-scale-relative gradient tolerance: large-n losses are O(n), so
        # an absolute grad-norm threshold would never trigger in f32
        threshold = tol * jnp.maximum(1.0, jnp.abs(value))
        return (count == 0) | ((count < max_iter) & (err >= threshold))

    init_state = opt.init(initial_value)
    final_params, final_state = jax.lax.while_loop(
        continuing, step, (initial_value, init_state)
    )
    final_value = otu.tree_get(final_state, "value")
    n_steps = otu.tree_get(final_state, "count")
    return final_params, final_value, n_steps


def minimize_lbfgsb(
    loss_func,
    initial_value,
    jit=DEFAULT_JIT,
    max_iter=DEFAULT_LBFGS_MAX_ITER,
    tol=DEFAULT_LBFGS_TOL,
    loss_args=(),
    precision=None,
):
    """On-device L-BFGS MAP optimization.

    API parity with ``mellon/inference.py:272-288`` (name kept for drop-in
    compatibility; the underlying algorithm is unbounded L-BFGS with zoom
    line search, which matches L-BFGS-B on these box-free problems).  The
    ``jit`` flag is accepted for parity but the solve is always compiled.

    Pass big operands through ``loss_args`` (with ``loss_func`` taking
    ``(z, *loss_args)``) so they enter the compiled program as runtime
    arguments instead of baked constants — one stable executable serves
    every fit of the same shape.

    ``precision="bf16"`` runs a two-phase solve: 3/4 of the iteration
    budget with the 2-D f32 operands stored as bfloat16 (halving the HBM
    traffic of each loss/grad evaluation — the roofline at atlas scale),
    then the remaining budget at f32 from the coarse optimum.  Measured at
    1M cells x 512 latents: 1.7x faster MAP with log-density correlation
    0.9999 / rmse 1.7% of the spread vs the single-phase f32 solve —
    opt-in, intended for bandwidth-bound (atlas-scale) fits.
    """
    if precision == "bf16" and not loss_args:
        # bf16 storage only applies to threaded operands; a closure-style
        # loss has nothing to cast, so run the standard single-phase solve
        logger.info(
            "precision='bf16' has no effect without operand-threaded "
            "loss_args; running the single-phase f32 solve."
        )
        precision = None
    if precision == "bf16":
        coarse_args = tuple(
            a.astype(jnp.bfloat16)
            if getattr(a, "ndim", 0) == 2 and a.dtype == jnp.float32
            else a
            for a in loss_args
        )
        coarse_iter = max(int(max_iter) * 3 // 4, 1)
        polish_iter = max(int(max_iter) - coarse_iter, 1)
        params, _, n1 = _run_lbfgs(
            loss_func, initial_value, coarse_iter, tol, *coarse_args
        )
        params, value, n2 = _run_lbfgs(
            loss_func, params, polish_iter, tol, *loss_args
        )
        n1, n2, value = jax.device_get((n1, n2, value))
        logger.info(
            "L-BFGS finished after %d bf16 + %d f32 steps with loss %.6g.",
            int(n1),
            int(n2),
            float(value),
        )
        return ResultsLoss(params, None, float(value))
    if precision is not None and precision != "f32":
        raise ValueError(f"Unknown precision option: {precision}")
    params, value, n_steps = _run_lbfgs(
        loss_func, initial_value, int(max_iter), tol, *loss_args
    )
    # one host transfer for both scalars (separate int()/float() calls would
    # each be a blocking device round trip)
    n_steps, value = jax.device_get((n_steps, value))
    logger.info(
        "L-BFGS finished after %d steps with loss %.6g.",
        int(n_steps),
        float(value),
    )
    return ResultsLoss(params, None, float(value))


minimize_lbfgs = minimize_lbfgsb


@partial(jax.jit, static_argnames=("loss_func", "n_iter"))
def _run_adam(loss_func, initial_value, n_iter, init_learn_rate, *loss_args):
    fun = (lambda z: loss_func(z, *loss_args)) if loss_args else loss_func
    schedule = lambda i: jnp.exp(-1e-2 * i) * init_learn_rate
    opt = optax.adam(schedule)

    def step(carry, i):
        params, state = carry
        value, grads = jax.value_and_grad(fun)(params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        return (params, state), value

    (params, state), losses = jax.lax.scan(
        step, (initial_value, opt.init(initial_value)), jnp.arange(n_iter)
    )
    return params, state, losses


def minimize_adam(
    loss_func,
    initial_value,
    n_iter=DEFAULT_N_ITER,
    init_learn_rate=DEFAULT_INIT_LEARN_RATE,
    jit=DEFAULT_JIT,
    loss_args=(),
):
    """adam with exponentially decaying learning rate, one compiled scan.

    Parity: ``mellon/inference.py:222-269`` (same schedule
    ``exp(-0.01 i) * lr0`` and defaults), but the n_iter steps run as a
    single ``lax.scan`` instead of a Python loop with per-step dispatch.
    See :func:`minimize_lbfgsb` for the ``loss_args`` convention.
    """
    params, state, losses = _run_adam(
        loss_func, initial_value, int(n_iter), init_learn_rate, *loss_args
    )
    return Results(params, state, losses)
