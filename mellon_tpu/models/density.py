"""Non-parametric cell-state density estimation.

Behavioural parity target: ``mellon/density_estimator.py`` (581 LoC):
GP prior + nearest-neighbor-distance likelihood, MAP/adam/ADVI inference,
optional diagonal-Laplace uncertainty, and a serializable conditional-mean
predictor.
"""

import logging

from ..inference.factories import compute_conditional
from ..inference.losses import (
    compute_log_density_x,
    compute_loss_func,
    compute_transform,
)
from ..inference.optimizers import (
    DEFAULT_INIT_LEARN_RATE,
    DEFAULT_JIT,
    DEFAULT_N_ITER,
    DEFAULT_OPTIMIZER,
)
from ..parameters import (
    DEFAULT_RANDOM_SEED,
    compute_d,
    compute_d_factal,
    compute_initial_value,
    compute_mu,
)
from ..utils.util import DEFAULT_JITTER, object_html
from ..utils.validation import validate_array, validate_string
from .base import BaseEstimator, DEFAULT_COV_FUNC

DEFAULT_D_METHOD = "embedding"

logger = logging.getLogger("mellon_tpu")


class DensityEstimator(BaseEstimator):
    """Bayesian log-density model with GP prior and 1-NN likelihood
    (parity: ``mellon/density_estimator.py:35-581``)."""

    def __init__(
        self,
        cov_func_curry=DEFAULT_COV_FUNC,
        n_landmarks=None,
        rank=None,
        gp_type=None,
        d_method=DEFAULT_D_METHOD,
        jitter=DEFAULT_JITTER,
        optimizer=DEFAULT_OPTIMIZER,
        n_iter=DEFAULT_N_ITER,
        init_learn_rate=DEFAULT_INIT_LEARN_RATE,
        landmarks=None,
        nn_distances=None,
        d=None,
        mu=None,
        ls=None,
        ls_factor=1,
        cov_func=None,
        Lp=None,
        L=None,
        initial_value=None,
        predictor_with_uncertainty=False,
        jit=DEFAULT_JIT,
        check_rank=None,
        random_state=DEFAULT_RANDOM_SEED,
        precision=None,
        sampler_options=None,
    ):
        super().__init__(
            cov_func_curry=cov_func_curry,
            n_landmarks=n_landmarks,
            rank=rank,
            jitter=jitter,
            gp_type=gp_type,
            optimizer=optimizer,
            n_iter=n_iter,
            init_learn_rate=init_learn_rate,
            landmarks=landmarks,
            nn_distances=nn_distances,
            d=d,
            mu=mu,
            ls=ls,
            ls_factor=ls_factor,
            cov_func=cov_func,
            Lp=Lp,
            L=L,
            initial_value=initial_value,
            predictor_with_uncertainty=predictor_with_uncertainty,
            precision=precision,
            jit=jit,
            check_rank=check_rank,
            random_state=random_state,
            sampler_options=sampler_options,
        )
        if d is not None:
            self.d_method = "manual"
            logger.info(f"Explicitly provided d={d}, setting d_method to 'manual'.")
        else:
            self.d_method = validate_string(
                d_method, "d_method", choices={"fractal", "embedding", "manual"}
            )
        self.transform = None
        self.loss_func = None
        self.opt_state = None
        self.losses = None
        self.pre_transformation = None
        self.pre_transformation_std = None
        self.log_density_x = None
        self.log_density_func = None

    def _repr_html_(self):
        header = """
        <h2>Density Estimator</h2>
        <p><em>A non-parametric density estimation model using Gaussian
        Processes and Nearest Neighbor Distance Distribution.</em></p>
        """
        core = f"""
        <h3>Core Attributes</h3>
        <ul>
            <li><strong>Covariance Function:</strong> {object_html(self.cov_func or 'Not Set')}</li>
            <li><strong>Optimizer:</strong> {self.optimizer}</li>
            <li><strong>Number of Landmarks:</strong> {self.n_landmarks or 'Not Set'}</li>
            <li><strong>Gaussian Process Type:</strong> {self.gp_type or 'Not Set'}</li>
            <li><strong>Dimensionality Method:</strong> {self.d_method}</li>
        </ul>
        """
        status = (
            "<p style='color:green;'><strong>Predictor:</strong> Available</p>"
            if self.log_density_func
            else "<p style='color:red;'><strong>Predictor:</strong> Not Yet Computed</p>"
        )
        return header + core + status

    def _compute_d(self):
        x = self.x
        if self.d_method == "fractal":
            d = compute_d_factal(x)
            logger.info(f"Using d={d}.")
        elif self.d_method == "manual":
            d = self.d
            if d is None:
                raise ValueError(
                    'd_method="manual" requires the intrinsic '
                    "dimensionality d to be passed explicitly."
                )
            logger.info(f"Using manually set d={d}.")
        else:
            d = compute_d(x)
            logger.info(
                f"Using embedding dimensionality d={d}. "
                'Use d_method="fractal" to enable effective density '
                "normalization."
            )
        if d > 50:
            message = f"""The detected dimensionality of the data is over 50,
            which is likely to cause numerical instability issues.
            Consider running a dimensionality reduction algorithm, or
            if this number of dimensions is intended, explicitly pass
            d={d} as a parameter."""
            raise ValueError(message)
        return d

    def _compute_mu(self):
        return compute_mu(self.nn_distances, self.d)

    def _compute_initial_value(self):
        return compute_initial_value(self.nn_distances, self.d, self.mu, self.L)

    def _compute_transform(self):
        return compute_transform(self.mu, self.L)

    def _compute_loss_func(self):
        from ..inference.losses import density_loss

        # operand-threaded static form used by the compiled optimizers and
        # samplers (no large constants baked into executables)
        self._loss_fn = density_loss
        self._loss_args = (self.L, self.nn_distances, self.d, self.mu)
        # closure form kept for API parity (prepare_inference returns it)
        k = self.initial_value.shape[0]
        return compute_loss_func(self.nn_distances, self.d, self.transform, k)

    def _set_log_density_x(self):
        self.log_density_x = compute_log_density_x(
            self.pre_transformation, self.transform
        )

    def _set_log_density_func(self):
        logger.info("Computing predictive function.")
        log_density_func = compute_conditional(
            self.x,
            self.landmarks,
            self.pre_transformation,
            self.pre_transformation_std,
            self.log_density_x,
            self.mu,
            self.cov_func,
            self.L,
            self.Lp,
            sigma=None,
            jitter=self.jitter,
            y_is_mean=True,
            with_uncertainty=self.predictor_with_uncertainty,
        )
        log_density_func.n_obs = self.x.shape[0]
        log_density_func.d = self.d
        log_density_func.d_method = self.d_method
        self.log_density_func = log_density_func

    def prepare_inference(self, x):
        """Set all attributes in preparation for optimization
        (parity: ``mellon/density_estimator.py:404-444``)."""
        if x is None:
            x = self.x
            if self.x is None:
                raise ValueError(
                    "Required argument x is missing and self.x has not been set."
                )
        else:
            if self.x is not None and self.x is not x:
                raise ValueError(
                    "self.x has been set already, but is not equal to the argument x."
                )
        x = self.set_x(x)
        self._prepare_attribute("n_landmarks")
        self._prepare_attribute("rank")
        self._prepare_attribute("gp_type")
        self.validate_parameter()
        # default sparse configuration: one fused program + one host fetch
        # sets nn_distances/d/mu/ls/cov_func/landmarks/Lp together (the lazy
        # chain below then finds them present); any customization falls
        # through to the lazy per-attribute path
        from .fused import (
            maybe_fused_nystroem_prepare,
            maybe_fused_sparse_prepare,
        )

        maybe_fused_sparse_prepare(self) or maybe_fused_nystroem_prepare(self)
        self._prepare_attribute("nn_distances")
        self._prepare_attribute("d")
        self._prepare_attribute("mu")
        self._prepare_attribute("ls")
        self._prepare_attribute("cov_func")
        self._prepare_attribute("landmarks")
        self._prepare_attribute("Lp")
        self._prepare_attribute("L")
        self._prepare_attribute("initial_value")
        self._prepare_attribute("transform")
        self._prepare_attribute("loss_func")
        return self.loss_func, self.initial_value

    def run_inference(self, loss_func=None, initial_value=None, optimizer=None):
        """Optimize the pre_transformation parameters
        (parity: ``mellon/density_estimator.py:446-469``)."""
        if loss_func is not None:
            self.loss_func = loss_func
        if initial_value is not None:
            self.initial_value = initial_value
        if optimizer is not None:
            self.optimizer = optimizer
        self._run_inference()
        return self.pre_transformation

    def process_inference(self, pre_transformation=None, build_predict=True):
        """Compute log density at training points and (optionally) the
        predictor (parity: ``mellon/density_estimator.py:471-492``)."""
        if pre_transformation is not None:
            self.pre_transformation = validate_array(
                pre_transformation, "pre_transformation"
            )
        self._set_log_density_x()
        if build_predict:
            self._set_log_density_func()
        return self.log_density_x

    def fit(self, x=None, build_predict=True):
        """End-to-end training (parity: ``mellon/density_estimator.py:494-516``)."""
        # run_inference is guaranteed to follow prepare here, so the fused
        # prepare may defer factorization validity to the optimizer's loss
        self._in_fit = True
        try:
            self.prepare_inference(x)
            self.run_inference()
        finally:
            self._in_fit = False
        self.process_inference(build_predict=build_predict)
        return self

    @property
    def predict(self):
        """The log-density predictor
        (parity: ``mellon/density_estimator.py:518-540``)."""
        if self.log_density_func is None:
            self._set_log_density_func()
        return self.log_density_func

    def fit_predict(self, x=None, build_predict=False):
        """Train and return the log density at the training points
        (parity: ``mellon/density_estimator.py:542-581``)."""
        if self.x is not None and x is not None and self.x is not x:
            message = "self.x has been set already, but is not equal to the argument x."
            error = ValueError(message)
            logger.error(error)
            raise error
        if self.x is None and x is None:
            message = "Required argument x is missing and self.x has not been set."
            error = ValueError(message)
            logger.error(error)
            raise error
        if x is None:
            x = self.x
        else:
            x = validate_array(x, "x")
        self.fit(x, build_predict=build_predict)
        return self.log_density_x
