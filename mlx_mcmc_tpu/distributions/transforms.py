"""Unconstraining bijectors for constrained parameters.

The reference handles constraints only through ``-inf`` rejection (e.g.
HalfNormal support masking) and records reparameterization as a lesson
learned it never implemented (PROGRESS.md:119). Here transforms are
first-class: samplers can run in unconstrained space with the log-|Jacobian|
correction applied automatically, which removes boundary rejections and the
gradient pathologies they cause.

Each transform maps *unconstrained -> constrained*:
    y = forward(x),  x = inverse(y),  log|dy/dx| = log_det_jacobian(x)

``make_transformed_logprob`` rewrites a dict-of-params model so selected
parameters are sampled in unconstrained space.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


class Transform:
    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def log_det_jacobian(self, x):
        """log |d forward(x) / dx|, summed over the parameter's elements."""
        raise NotImplementedError


class Identity(Transform):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def log_det_jacobian(self, x):
        return jnp.zeros(())


class Exp(Transform):
    """R -> (0, inf): for scales, rates and other positive parameters."""

    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def log_det_jacobian(self, x):
        return jnp.sum(x)


class Softplus(Transform):
    """R -> (0, inf) with linear tails (better conditioned than Exp for
    large positive values)."""

    def forward(self, x):
        return jax.nn.softplus(x)

    def inverse(self, y):
        return y + jnp.log(-jnp.expm1(-y))

    def log_det_jacobian(self, x):
        return jnp.sum(-jax.nn.softplus(-x))


class Sigmoid(Transform):
    """R -> (0, 1): for probabilities (Beta-distributed parameters)."""

    def forward(self, x):
        return jax.nn.sigmoid(x)

    def inverse(self, y):
        return jnp.log(y) - jnp.log1p(-y)

    def log_det_jacobian(self, x):
        return jnp.sum(-jax.nn.softplus(-x) - jax.nn.softplus(x))


class StickBreaking(Transform):
    """R^{K-1} -> interior of the K-simplex (Stan's stick-breaking map)."""

    def forward(self, x):
        k = x.shape[-1]
        offset = jnp.log(jnp.arange(k, 0, -1, dtype=x.dtype))
        z = jax.nn.sigmoid(x - offset)
        cum = jnp.concatenate([jnp.ones(x.shape[:-1] + (1,), x.dtype),
                               jnp.cumprod(1.0 - z, axis=-1)], axis=-1)
        head = cum[..., :-1] * z
        return jnp.concatenate([head, cum[..., -1:]], axis=-1)

    def inverse(self, y):
        k = y.shape[-1] - 1
        rem = 1.0 - jnp.concatenate(
            [jnp.zeros(y.shape[:-1] + (1,), y.dtype), jnp.cumsum(y[..., :-1], -1)],
            axis=-1,
        )[..., :-1]
        z = y[..., :-1] / rem
        offset = jnp.log(jnp.arange(k, 0, -1, dtype=y.dtype))
        return jnp.log(z) - jnp.log1p(-z) + offset

    def log_det_jacobian(self, x):
        k = x.shape[-1]
        offset = jnp.log(jnp.arange(k, 0, -1, dtype=x.dtype))
        xs = x - offset
        z = jax.nn.sigmoid(xs)
        log_sigmoid_det = -jax.nn.softplus(-xs) - jax.nn.softplus(xs)
        cumlog1mz = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (1,), x.dtype),
             jnp.cumsum(jnp.log1p(-z[..., :-1]), axis=-1)],
            axis=-1,
        )
        return jnp.sum(log_sigmoid_det + cumlog1mz)


_NAMED: Dict[str, Callable[[], Transform]] = {
    "identity": Identity,
    "exp": Exp,
    "log": Exp,  # alias: parameter constrained positive, sampled as its log
    "softplus": Softplus,
    "sigmoid": Sigmoid,
    "logit": Sigmoid,
    "simplex": StickBreaking,
}


def get_transform(t) -> Transform:
    if isinstance(t, Transform):
        return t
    return _NAMED[t]()


def make_transformed_logprob(
    log_prob_fn: Callable[..., jnp.ndarray],
    transforms: Dict[str, Any],
    data_aware: bool = False,
) -> Tuple[Callable, Callable, Callable]:
    """Rewrite a dict-of-params model to sample in unconstrained space.

    Returns ``(u_log_prob, to_constrained, to_unconstrained)`` where
    ``u_log_prob(u_params) = log_prob(constrain(u_params)) + log|J|``.
    Parameters not named in ``transforms`` pass through unchanged.
    With ``data_aware=True`` the model (and the returned ``u_log_prob``)
    additionally take a ``data`` argument.
    """
    tfs = {k: get_transform(v) for k, v in transforms.items()}

    def to_constrained(u_params):
        return {
            k: (tfs[k].forward(v) if k in tfs else v) for k, v in u_params.items()
        }

    def to_unconstrained(params):
        return {
            k: (tfs[k].inverse(jnp.asarray(v, jnp.result_type(float)))
                if k in tfs else v)
            for k, v in params.items()
        }

    def _jacobian(u_params):
        lp = jnp.zeros(())
        for k, tf in tfs.items():
            lp = lp + tf.log_det_jacobian(jnp.asarray(u_params[k]))
        return lp

    if data_aware:

        def u_log_prob(u_params, data):
            return log_prob_fn(to_constrained(u_params), data) + _jacobian(u_params)

    else:

        def u_log_prob(u_params):
            return log_prob_fn(to_constrained(u_params)) + _jacobian(u_params)

    return u_log_prob, to_constrained, to_unconstrained
