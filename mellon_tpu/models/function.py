"""GP smoothing/extension of observed function values (gene trends).

Behavioural parity target: ``mellon/function_estimator.py`` (615 LoC): no
optimization — a direct conditional mean with scalar / per-feature / (n, p)
noise sigma, leverage, LOO residuals, and smoothed observation variance.
"""

import logging

from ..inference.factories import compute_conditional
from ..inference.optimizers import (
    DEFAULT_INIT_LEARN_RATE,
    DEFAULT_N_ITER,
    DEFAULT_OPTIMIZER,
)
from ..parameters import DEFAULT_RANDOM_SEED
from ..utils.util import (
    DEFAULT_JITTER,
    GaussianProcessType,
    object_html,
    object_str,
)
from ..utils.validation import (
    validate_array,
    validate_bool,
    validate_float,
    validate_float_or_iterable_numerical,
)
from .base import BaseEstimator, DEFAULT_COV_FUNC

logger = logging.getLogger("mellon_tpu")


class FunctionEstimator(BaseEstimator):
    """Conditional-mean function smoothing
    (parity: ``mellon/function_estimator.py:29-615``)."""

    def __init__(
        self,
        cov_func_curry=DEFAULT_COV_FUNC,
        n_landmarks=None,
        gp_type=None,
        jitter=DEFAULT_JITTER,
        optimizer=DEFAULT_OPTIMIZER,
        n_iter=DEFAULT_N_ITER,
        init_learn_rate=DEFAULT_INIT_LEARN_RATE,
        landmarks=None,
        nn_distances=None,
        mu=0,
        ls=None,
        ls_factor=1,
        cov_func=None,
        sigma=0,
        y_is_mean=False,
        predictor_with_uncertainty=False,
        obs_variance=False,
        jit=True,
        random_state=DEFAULT_RANDOM_SEED,
    ):
        super().__init__(
            cov_func_curry=cov_func_curry,
            n_landmarks=n_landmarks,
            rank=1.0,
            jitter=jitter,
            gp_type=gp_type,
            landmarks=landmarks,
            nn_distances=nn_distances,
            mu=mu,
            ls=ls,
            ls_factor=ls_factor,
            cov_func=cov_func,
            predictor_with_uncertainty=predictor_with_uncertainty,
            jit=jit,
            random_state=random_state,
        )
        self.y_is_mean = validate_bool(y_is_mean, "y_is_mean")
        self.mu = validate_float(mu, "mu")
        self.sigma = validate_float_or_iterable_numerical(
            sigma, "sigma", positive=True
        )
        self.obs_variance = validate_bool(obs_variance, "obs_variance")
        self.conditional = None
        if self.gp_type in (
            GaussianProcessType.FULL_NYSTROEM,
            GaussianProcessType.SPARSE_NYSTROEM,
        ):
            message = (
                f"gp_type={gp_type} but the Nyström rank reduction is "
                "not available for the Function Estimator. "
                "Use gp_type='cholesky' or gp_type='full' instead."
            )
            logger.error(message)
            raise ValueError(message)

    def __call__(self, x=None, y=None):
        return self.fit_predict(x=x, y=y)

    def __repr__(self):
        name = self.__class__.__name__
        landmarks = object_str(self.landmarks, ["landmarks", "dims"])
        nn_distances = object_str(self.nn_distances, ["cells"])
        return (
            f"{name}("
            f"\n    cov_func={self.cov_func},"
            f"\n    cov_func_curry={self.cov_func_curry},"
            f"\n    gp_type={self.gp_type},"
            f"\n    jitter={self.jitter},"
            f"\n    landmarks={landmarks},"
            f"\n    ls={self.ls},"
            f"\n    ls_factor={self.ls_factor},"
            f"\n    mu={self.mu},"
            f"\n    n_landmarks={self.n_landmarks},"
            f"\n    nn_distances={nn_distances},"
            f"\n    predictor_with_uncertainty={self.predictor_with_uncertainty},"
            f"\n    random_state={self.random_state},"
            f"\n    sigma={self.sigma},"
            f"\n    y_is_mean={self.y_is_mean},"
            "\n)"
        )

    def _repr_html_(self):
        header = """
        <h2>Function Estimator</h2>
        <p><em>Conditional-mean smoothing of observed function values over
        cell states using a Gaussian Process.</em></p>
        """
        core = f"""
        <h3>Core Attributes</h3>
        <ul>
            <li><strong>Covariance Function:</strong> {object_html(self.cov_func or 'Not Set')}</li>
            <li><strong>Number of Landmarks:</strong> {self.n_landmarks or 'Not Set'}</li>
            <li><strong>Gaussian Process Type:</strong> {self.gp_type or 'Not Set'}</li>
            <li><strong>Noise Standard Deviation (σ):</strong> {object_html(self.sigma)}</li>
            <li><strong>Predictor with Uncertainty:</strong> {'Yes' if self.predictor_with_uncertainty else 'No'}</li>
        </ul>
        """
        status = (
            "<p style='color:green;'><strong>Predictor:</strong> Available</p>"
            if getattr(self, "conditional", None)
            else "<p style='color:red;'><strong>Predictor:</strong> Not Yet Computed</p>"
        )
        return header + core + status

    def prepare_inference(self, x):
        """Prepare attributes (no optimization step exists)
        (parity: ``mellon/function_estimator.py:295-316``)."""
        x = self.set_x(x)
        self._prepare_attribute("n_landmarks")
        self._prepare_attribute("gp_type")
        # default sparse configuration: one fused program + one host fetch
        # sets nn_distances/ls/cov_func/landmarks together
        from .fused import maybe_fused_function_prepare

        maybe_fused_function_prepare(self)
        if self.ls is None and self.cov_func is None:
            self._prepare_attribute("nn_distances")
        self._prepare_attribute("ls")
        self._prepare_attribute("cov_func")
        self._prepare_attribute("landmarks")

    def compute_conditional(self, x=None, y=None, obs_variance=None):
        """Build the conditional-mean predictor
        (parity: ``mellon/function_estimator.py:318-374``)."""
        if x is None:
            x = self.x
        else:
            x = validate_array(x, "x")
        if self.x is not None and self.x is not x:
            logger.warning(
                "self.x has been set already, but is not equal to the argument x. "
                "Current landmarks might be inapropriate."
            )
        if self.x is None and x is None:
            raise ValueError(
                "Required argument x is missing and self.x has not been set."
            )
        if y is None:
            raise ValueError("Required argument y is missing.")
        if obs_variance is None:
            obs_variance = self.obs_variance
        # Reuse the landmark Cholesky across repeated conditioning calls
        # (fit_predict in a gene-trend loop re-pays the m³ factorization in
        # the reference, which always passes Lp=None here,
        # ``mellon/function_estimator.py:357-374``).  compute_Lp uses
        # sigma=0, matching the noise-free Lp the conditional would build.
        Lp_arg = None
        if (
            self.landmarks is not None
            and self.gp_type
            in (GaussianProcessType.SPARSE_CHOLESKY, GaussianProcessType.FIXED)
        ):
            self._prepare_attribute("Lp")
            Lp_arg = self.Lp
        conditional = compute_conditional(
            x,
            self.landmarks,
            None,
            None,
            y,
            self.mu,
            self.cov_func,
            None,
            Lp_arg,
            self.sigma,
            jitter=self.jitter,
            y_is_mean=self.y_is_mean,
            with_uncertainty=self.predictor_with_uncertainty,
            obs_variance=obs_variance,
        )
        self.conditional = conditional
        return conditional

    def fit(self, x=None, y=None, obs_variance=None):
        """Prepare and condition on (x, y)
        (parity: ``mellon/function_estimator.py:376-419``)."""
        x = self.set_x(x)
        y = validate_array(y, "y")
        n_samples = x.shape[0]
        if y.shape[0] != n_samples:
            raise ValueError(
                f"X.shape[0] = {n_samples:,} (n_samples) should equal "
                f"y.shape[0] = {y.shape[0]:,}."
            )
        self.prepare_inference(x)
        self.compute_conditional(x, y, obs_variance=obs_variance)
        self.y = y
        return self

    @property
    def predict(self):
        if self.conditional is None:
            raise ValueError(
                "The predictor is not yet computed. Call fit(x, y) or "
                "fit_predict(x, y) first."
            )
        return self.conditional

    def leverage(self, X=None):
        """Hat-matrix diagonal at X (defaults to training points)
        (parity: ``mellon/function_estimator.py:443-459``)."""
        if X is None:
            X = self.x
        return self.predict.leverage(X)

    def loo_residuals_squared(self, X=None, y=None):
        """Squared LOO residuals via the HC3 shortcut
        (parity: ``mellon/function_estimator.py:461-487``)."""
        if X is None and y is None:
            if hasattr(self.predict, "_corrected_r2"):
                return self.predict._corrected_r2
            X, y = self.x, self.y
        else:
            if X is None:
                X = self.x
            if y is None:
                y = self.y
        return self.predict.loo_residuals_squared(X, y)

    def get_obs_variance(self, X=None):
        """Smoothed observation variance
        (parity: ``mellon/function_estimator.py:489-505``)."""
        if X is None:
            X = self.x
        return self.predict.obs_variance(X)

    def fit_predict(self, x=None, y=None, Xnew=None):
        """Fit on (x, y) and evaluate the conditional mean at Xnew
        (parity: ``mellon/function_estimator.py:507-565``)."""
        x = self.set_x(x)
        y = validate_array(y, "y")
        Xnew = validate_array(Xnew, "Xnew", optional=True)
        if Xnew is None:
            Xnew = x
        else:
            if x.ndim != Xnew.ndim:
                raise ValueError(
                    "The provided arrays, 'x' and 'Xnew', do not have the "
                    f"same number of dimensions. 'x' is {x.ndim}-D and 'Xnew' "
                    f"is {Xnew.ndim}-D. Please provide arrays with consistent "
                    "dimensionality."
                )
            if x.ndim > 1 and x.shape[1] != Xnew.shape[1]:
                raise ValueError(
                    "The provided arrays, 'x' and 'Xnew', should have the "
                    f"same number of features. Got Xnew.shape[1] = "
                    f"{Xnew.shape[1]}, but expected it to be equal to "
                    f"x.shape[1] = {x.shape[1]}. Please provide arrays with "
                    "the same number of features."
                )
        self.fit(x, y)
        return self.predict(Xnew)

    def multi_fit_predict(self, x=None, Y=None, Xnew=None):
        """Deprecated row-wise variant
        (parity: ``mellon/function_estimator.py:567-615``)."""
        logger.warning(
            "Deprecation Warning: FunctionEstimator's multi_fit_predict "
            "method is deprecated. Use FunctionEstimator.fit_predict instead."
        )
        x = self.set_x(x)
        Y = validate_array(Y, "Y")
        n_samples = x.shape[0]
        if Y.shape[0] != n_samples:
            if Y.ndim > 1 and Y.shape[1] == n_samples:
                logger.warning(
                    "Y.shape[0] does not equal X.shape[0] (the number of "
                    "samples). However, Y.shape[1] == X.shape[0]. Transposing "
                    "Y. This assumes the columns of Y are the samples. Please "
                    "verify."
                )
                Y = Y.T
        return self.fit_predict(x, Y, Xnew).T
