"""Joint local-dimensionality + density estimation.

Behavioural parity target: ``mellon/dimensionality_estimator.py`` (677 LoC):
two GPs (log local dimension, log density) sharing one L, Poisson k-NN
likelihood, ExpPredictor for the dimension.
"""

import logging

from ..inference.factories import compute_conditional, compute_conditional_explog
from ..inference.losses import (
    compute_dimensionality_loss_func,
    compute_dimensionality_transform,
    compute_log_density_x,
)
from ..inference.optimizers import (
    DEFAULT_INIT_LEARN_RATE,
    DEFAULT_JIT,
    DEFAULT_N_ITER,
    DEFAULT_OPTIMIZER,
)
from ..ops.neighbors import local_dimensionality
from ..parameters import (
    DEFAULT_RANDOM_SEED,
    compute_distances,
    compute_initial_dimensionalities,
    compute_mu,
)
from ..utils.util import DEFAULT_JITTER, object_str
from ..utils.validation import (
    validate_array,
    validate_float,
    validate_positive_int,
)
from .base import BaseEstimator, DEFAULT_COV_FUNC

logger = logging.getLogger("mellon_tpu")


class DimensionalityEstimator(BaseEstimator):
    """Joint local-fractal-dimension and density model
    (parity: ``mellon/dimensionality_estimator.py:36-677``)."""

    def __init__(
        self,
        cov_func_curry=DEFAULT_COV_FUNC,
        n_landmarks=None,
        rank=None,
        gp_type=None,
        jitter=DEFAULT_JITTER,
        optimizer=DEFAULT_OPTIMIZER,
        n_iter=DEFAULT_N_ITER,
        init_learn_rate=DEFAULT_INIT_LEARN_RATE,
        landmarks=None,
        k=10,
        distances=None,
        d=None,
        mu_dim=0,
        mu_dens=None,
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
        sampler_options=None,
    ):
        super().__init__(
            cov_func_curry=cov_func_curry,
            n_landmarks=n_landmarks,
            rank=rank,
            gp_type=gp_type,
            jitter=jitter,
            optimizer=optimizer,
            n_iter=n_iter,
            init_learn_rate=init_learn_rate,
            landmarks=landmarks,
            nn_distances=None,
            d=d,
            mu=mu_dens,
            ls=ls,
            ls_factor=ls_factor,
            cov_func=cov_func,
            Lp=Lp,
            L=L,
            initial_value=initial_value,
            predictor_with_uncertainty=predictor_with_uncertainty,
            jit=jit,
            check_rank=check_rank,
            random_state=random_state,
            sampler_options=sampler_options,
        )
        self.k = validate_positive_int(k, "k")
        self.mu_dim = validate_float(mu_dim, "mu_dim")
        self.mu_dens = validate_float(mu_dens, "mu_dens", optional=True)
        self.distances = validate_array(distances, "distances", optional=True)
        self.transform = None
        self.loss_func = None
        self.opt_state = None
        self.losses = None
        self.pre_transformation = None
        self.pre_transformation_std = None
        self.local_dim_x = None
        self.log_density_x = None
        self.local_dim_func = None
        self.log_density_func = None

    def __repr__(self):
        name = self.__class__.__name__
        landmarks = object_str(self.landmarks, ["landmarks", "dims"])
        L = object_str(self.L, ["cells", "ranks"])
        d = object_str(self.d, ["cells"])
        return (
            f"{name}("
            f"\n    cov_func={self.cov_func},"
            f"\n    cov_func_curry={self.cov_func_curry},"
            f"\n    d={d},"
            f"\n    gp_type={self.gp_type},"
            f"\n    k={self.k},"
            f"\n    L={L},"
            f"\n    landmarks={landmarks},"
            f"\n    ls={self.ls},"
            f"\n    mu_dens={self.mu_dens},"
            f"\n    mu_dim={self.mu_dim},"
            f"\n    n_landmarks={self.n_landmarks},"
            f"\n    optimizer={self.optimizer},"
            f"\n    rank={self.rank},"
            "\n)"
        )

    def _repr_html_(self):
        from ..utils.util import object_html

        header = f"""
        <h2>Dimensionality Estimator: {self.__class__.__name__}</h2>
        <p><em>A non-parametric method for estimating local dimensionality
        and density using Gaussian Processes.</em></p>
        """
        core = f"""
        <ul>
            <li><strong>Covariance Function:</strong> {object_html(self.cov_func or 'Not Set')}</li>
            <li><strong>Optimizer:</strong> {self.optimizer}</li>
            <li><strong>Number of Landmarks:</strong> {self.n_landmarks or 'Not Set'}</li>
            <li><strong>Gaussian Process Type:</strong> {self.gp_type or 'Not Set'}</li>
            <li><strong>k (nearest neighbors):</strong> {self.k}</li>
        </ul>
        """
        status = (
            "<p style='color:green;'><strong>Predictors:</strong> Available</p>"
            if self.local_dim_func and self.log_density_func
            else "<p style='color:red;'><strong>Predictors:</strong> Not Yet Computed</p>"
        )
        return header + core + status

    def _compute_mu_dens(self):
        return compute_mu(self.nn_distances, self.d)

    def _compute_d(self):
        return local_dimensionality(self.x, neighbor_idx=None)

    def _compute_initial_value(self):
        return compute_initial_dimensionalities(
            self.x, self.mu_dim, self.mu_dens, self.L, self.nn_distances, self.d
        )

    def _compute_transform(self):
        return compute_dimensionality_transform(self.mu_dim, self.mu_dens, self.L)

    def _compute_distances(self):
        logger.info("Computing distances.")
        seed = (
            self.random_state if self.random_state is not None else DEFAULT_RANDOM_SEED
        )
        return compute_distances(self.x, k=self.k, seed=seed)

    def _compute_nn_distances(self):
        return self.distances[:, 0]

    def _compute_loss_func(self):
        from ..inference.losses import dimensionality_loss

        self._loss_fn = dimensionality_loss
        self._loss_args = (self.L, self.distances, self.mu_dim, self.mu_dens)
        k = self.initial_value.shape[0]
        return compute_dimensionality_loss_func(self.distances, self.transform, k)

    def _set_local_dim_x(self):
        local_dim_x, log_density_x = compute_log_density_x(
            self.pre_transformation, self.transform
        )
        self.local_dim_x = local_dim_x
        self.log_density_x = log_density_x

    def _set_local_dim_func(self):
        pre_transformation = self.pre_transformation[0, :]
        pre_transformation_std = self.pre_transformation_std
        if pre_transformation_std is not None:
            pre_transformation_std = pre_transformation_std[0, :]
        logger.info("Computing predictive dimensionality function.")
        self.local_dim_func = compute_conditional_explog(
            self.x,
            self.landmarks,
            pre_transformation,
            pre_transformation_std,
            self.local_dim_x,
            self.mu_dim,
            self.cov_func,
            self.L,
            self.Lp,
            sigma=None,
            jitter=self.jitter,
            y_is_mean=True,
            with_uncertainty=self.predictor_with_uncertainty,
        )

    def _set_log_density_func(self):
        pre_transformation = self.pre_transformation[1, :]
        pre_transformation_std = self.pre_transformation_std
        if pre_transformation_std is not None:
            pre_transformation_std = pre_transformation_std[1, :]
        logger.info("Computing predictive density function.")
        self.log_density_func = compute_conditional(
            self.x,
            self.landmarks,
            pre_transformation,
            pre_transformation_std,
            self.log_density_x,
            self.mu_dens,
            self.cov_func,
            self.L,
            self.Lp,
            sigma=None,
            jitter=self.jitter,
            y_is_mean=True,
            with_uncertainty=self.predictor_with_uncertainty,
        )

    def prepare_inference(self, x):
        """Parity: ``mellon/dimensionality_estimator.py:469-510``."""
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
        # sets distances/nn_distances/d/mu_dens/ls/cov_func/landmarks/Lp
        # (+ L/initial_value); customizations fall back to the lazy chain
        from .fused import maybe_fused_dimensionality_prepare

        maybe_fused_dimensionality_prepare(self)
        self._prepare_attribute("distances")
        self._prepare_attribute("nn_distances")
        self._prepare_attribute("d")
        self._prepare_attribute("mu_dens")
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
        if loss_func is not None:
            self.loss_func = loss_func
        if initial_value is not None:
            self.initial_value = initial_value
        if optimizer is not None:
            self.optimizer = optimizer
        self._run_inference()
        return self.pre_transformation

    def process_inference(self, pre_transformation=None, build_predict=True):
        if pre_transformation is not None:
            self.pre_transformation = pre_transformation
        self._set_local_dim_x()
        if build_predict:
            self._set_local_dim_func()
            self._set_log_density_func()
        return self.local_dim_x, self.log_density_x

    def fit(self, x=None, build_predict=True):
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
    def predict_density(self):
        """Log-density predictor
        (parity: ``mellon/dimensionality_estimator.py:584-606``)."""
        if self.log_density_func is None:
            self._set_log_density_func()
        return self.log_density_func

    @property
    def predict(self):
        """Local-dimension ExpPredictor
        (parity: ``mellon/dimensionality_estimator.py:608-632``)."""
        if self.local_dim_func is None:
            self._set_local_dim_func()
        return self.local_dim_func

    def fit_predict(self, x=None, build_predict=False):
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
        return self.local_dim_x
