"""Time-sensitive cell-state density estimation.

Behavioural parity target: ``mellon/time_sensitive_density_estimator.py``
(796 LoC): a space×time product kernel, within-time-point 1-NN distances with
optional sampling-bias normalization, landmark selection in time-rescaled
space, and a time-aware predictor normalized by average cells per time point.
"""

import logging

from ..inference.factories import compute_conditional_times
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
    compute_average_cell_count,
    compute_cov_func,
    compute_d,
    compute_d_factal,
    compute_initial_value,
    compute_landmarks_rescale_time,
    compute_ls,
    compute_mu,
    compute_nn_distances_within_time_points,
)
from ..utils.util import DEFAULT_JITTER, object_str
from ..utils.validation import (
    validate_array,
    validate_nn_distances,
    validate_positive_float,
    validate_string,
    validate_time_x,
)
from .base import BaseEstimator, DEFAULT_COV_FUNC
from .ls_time import compute_ls_time

DEFAULT_D_METHOD = "embedding"

logger = logging.getLogger("mellon_tpu")


class TimeSensitiveDensityEstimator(BaseEstimator):
    """Density over (state, time) with product kernel
    (parity: ``mellon/time_sensitive_density_estimator.py:45-796``)."""

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
        normalize_per_time_point=False,
        d=None,
        mu=None,
        ls=None,
        ls_time=None,
        ls_factor=1,
        ls_time_factor=1,
        density_estimator_kwargs=dict(),
        cov_func=None,
        Lp=None,
        L=None,
        initial_value=None,
        predictor_with_uncertainty=False,
        _save_intermediate_ls_times=False,
        jit=DEFAULT_JIT,
        check_rank=None,
        random_state=DEFAULT_RANDOM_SEED,
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
            jit=jit,
            check_rank=check_rank,
            random_state=random_state,
            sampler_options=sampler_options,
        )
        if not isinstance(density_estimator_kwargs, dict):
            raise ValueError("density_estimator_kwargs needs to be a dictionary.")
        self.density_estimator_kwargs = density_estimator_kwargs
        if d is not None:
            self.d_method = "manual"
            logger.info(f"Explicitly provided d={d}, setting d_method to 'manual'.")
        else:
            self.d_method = validate_string(
                d_method, "d_method", choices={"fractal", "embedding", "manual"}
            )
        self.ls_time = validate_positive_float(ls_time, "ls_time", optional=True)
        self.ls_time_factor = validate_positive_float(
            ls_time_factor, "ls_time_factor"
        )
        self._save_intermediate_ls_times = _save_intermediate_ls_times
        self.normalize_per_time_point = normalize_per_time_point
        self.transform = None
        self.loss_func = None
        self.opt_state = None
        self.losses = None
        self.pre_transformation = None
        self.pre_transformation_std = None
        self.log_density_x = None
        self.log_density_func = None

    def __repr__(self):
        name = self.__class__.__name__
        landmarks = object_str(self.landmarks, ["landmarks", "dims"])
        L = object_str(self.L, ["cells", "ranks"])
        nn_distances = object_str(self.nn_distances, ["cells"])
        return (
            f"{name}("
            f"\n    cov_func={self.cov_func},"
            f"\n    gp_type={self.gp_type},"
            f"\n    landmarks={landmarks},"
            f"\n    L={L},"
            f"\n    ls={self.ls},"
            f"\n    ls_time={self.ls_time},"
            f"\n    mu={self.mu},"
            f"\n    n_landmarks={self.n_landmarks},"
            f"\n    nn_distances={nn_distances},"
            f"\n    normalize_per_time_point={self.normalize_per_time_point},"
            f"\n    optimizer={self.optimizer},"
            f"\n    rank={self.rank},"
            "\n)"
        )

    def _repr_html_(self):
        from ..utils.util import object_html

        header = f"""
        <h2>Time-Sensitive Density Estimator: {self.__class__.__name__}</h2>
        <p><em>A non-parametric density estimation model with time
        sensitivity using Gaussian Processes.</em></p>
        """
        core = f"""
        <ul>
            <li><strong>Covariance Function:</strong> {object_html(self.cov_func or 'Not Set')}</li>
            <li><strong>Optimizer:</strong> {self.optimizer}</li>
            <li><strong>Number of Landmarks:</strong> {self.n_landmarks or 'Not Set'}</li>
            <li><strong>Gaussian Process Type:</strong> {self.gp_type or 'Not Set'}</li>
            <li><strong>Time Normalization:</strong> {object_html(self.normalize_per_time_point or 'Disabled')}</li>
        </ul>
        """
        status = (
            "<p style='color:green;'><strong>Predictor:</strong> Available</p>"
            if self.log_density_func
            else "<p style='color:red;'><strong>Predictor:</strong> Not Yet Computed</p>"
        )
        return header + core + status

    def _compute_d(self):
        x = self.x[:, :-1]
        if self.d_method == "fractal":
            logger.warning("Using EXPERIMENTAL fractal dimensionality selection.")
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

        self._loss_fn = density_loss
        self._loss_args = (self.L, self.nn_distances, self.d, self.mu)
        k = self.initial_value.shape[0]
        return compute_loss_func(self.nn_distances, self.d, self.transform, k)

    def _compute_nn_distances(self):
        logger.info("Computing nearest neighbor distances within time points.")
        nn_distances = compute_nn_distances_within_time_points(
            self.x, d=self.d, normalize=self.normalize_per_time_point
        )
        return validate_nn_distances(nn_distances)

    def _compute_ls(self):
        nn_distances = self.nn_distances
        normalized = self.normalize_per_time_point
        if normalized is not False and normalized is not None:
            logger.info(
                "Computing non-normalized nn_distances for length scale heuristic."
            )
            nn_distances = compute_nn_distances_within_time_points(
                self.x, normalize=False
            )
        ls = compute_ls(nn_distances)
        ls *= self.ls_factor
        return ls

    def _compute_ls_time(self):
        density_estimator_kwargs = {
            "cov_func_curry": self.cov_func_curry,
            "d_method": self.d_method,
            "d": self.d,
            "optimizer": self.optimizer,
            "ls": self.ls,
            "ls_factor": self.ls_factor,
            "jit": self.jit,
            "mu": self.mu,
        }
        density_estimator_kwargs.update(self.density_estimator_kwargs)
        logger.info(
            "Initiating density computation for each time point to estimate "
            "the 'ls_time' parameter. You can directly specify 'ls_time' to "
            "bypass this computation-intensive step."
        )
        ls = compute_ls_time(
            self.nn_distances,
            self.x,
            self.cov_func_curry,
            return_data=self._save_intermediate_ls_times,
            density_estimator_kwargs=density_estimator_kwargs,
        )
        if self._save_intermediate_ls_times:
            logger.info(
                "Storing `self.densities`, `self.predictors`, and "
                "`self.numeric_stages`."
            )
            ls, self.densities, self.predictors, self.numeric_stages = ls
        ls *= self.ls_time_factor
        return ls

    def _compute_landmarks(self):
        x = self.x
        n_landmarks = self.n_landmarks
        random_state = self._landmark_advisory_and_seed(x.shape[0], n_landmarks)
        return compute_landmarks_rescale_time(
            x,
            self.ls,
            self.ls_time,
            n_landmarks=n_landmarks,
            random_state=random_state,
        )

    def _compute_cov_func(self):
        cov_func = compute_cov_func(self.cov_func_curry, self.ls, self.ls_time)
        logger.info("Using covariance function %s.", str(cov_func))
        return cov_func

    def _set_log_density_x(self):
        self.log_density_x = compute_log_density_x(
            self.pre_transformation, self.transform
        )

    def _set_log_density_func(self):
        logger.info("Computing predictive function.")
        log_density_func = compute_conditional_times(
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
        log_density_func.n_obs = compute_average_cell_count(
            self.x, self.normalize_per_time_point
        )
        log_density_func.d = self.d
        log_density_func.d_method = self.d_method
        self.log_density_func = log_density_func

    def prepare_inference(self, x, times=None):
        """Parity: ``mellon/time_sensitive_density_estimator.py:608-665``."""
        if x is None:
            x = self.x
            if self.x is None:
                raise ValueError(
                    "Required argument x is missing and self.x has not been set."
                )
        else:
            x = validate_time_x(x, times)
            if self.x is not None and self.x is not x:
                raise ValueError(
                    "self.x has been set already, but is not equal to the argument x."
                )
        x = self.set_x(x)
        self._prepare_attribute("n_landmarks")
        self._prepare_attribute("rank")
        self._prepare_attribute("gp_type")
        self.validate_parameter()
        # default sparse configuration with a given ls_time: one fused
        # program + one host fetch sets nn_distances/d/mu/ls/cov_func/
        # landmarks/Lp (+ L/initial_value); customizations fall through to
        # the lazy per-attribute path below
        from .fused import maybe_fused_time_prepare

        maybe_fused_time_prepare(self)
        self._prepare_attribute("d")
        self._prepare_attribute("nn_distances")
        self._prepare_attribute("mu")
        self._prepare_attribute("ls")
        self._prepare_attribute("ls_time")
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
            self.pre_transformation = validate_array(
                pre_transformation, "pre_transformation"
            )
        self._set_log_density_x()
        if build_predict:
            self._set_log_density_func()
        return self.log_density_x

    def fit(self, x=None, times=None, build_predict=True):
        # run_inference is guaranteed to follow prepare here, so the fused
        # prepare may defer factorization validity to the optimizer's loss
        self._in_fit = True
        try:
            self.prepare_inference(x, times)
            self.run_inference()
        finally:
            self._in_fit = False
        self.process_inference(build_predict=build_predict)
        return self

    @property
    def predict(self):
        """Time-aware log-density predictor
        (parity: ``mellon/time_sensitive_density_estimator.py:746-770``)."""
        if self.log_density_func is None:
            self._set_log_density_func()
        return self.log_density_func

    def fit_predict(self, x=None, times=None, build_predict=False):
        if x is not None:
            x = validate_time_x(x, times)
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
        self.fit(x, build_predict=build_predict)
        return self.log_density_x
