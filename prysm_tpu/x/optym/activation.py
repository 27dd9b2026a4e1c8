"""Activation functions and related nodes.

Rebuild of ``prysm/x/optym/activation.py``.  The forward/backprop pair API
is preserved for manual-chain users; every forward is also a pure jnp
function, so ``jax.grad`` gives the same gradients automatically.
GumbelSoftmax takes an explicit jax.random key.
"""
import numpy as onp
import jax
import jax.numpy as jnp

from ...mathops import row_dot
from ...conf import config


class Softmax:
    """Softmax over the final axis; leading axes are independent variables."""

    def __init__(self):
        """Create a new Softmax node."""
        self.out = None
        self.in_shape = None
        self.work_shape = None

    def forward(self, x):
        """Softmax activation on logits; sum(axis=-1) == 1."""
        assert x.ndim > 1, 'softmax is meant for multiple independent variables at once'
        xx = x.reshape((-1, x.shape[-1]))
        self.in_shape = x.shape
        self.work_shape = xx.shape
        xnorm = xx - xx.max(axis=1)[:, None]
        e_x = jnp.exp(xnorm)
        self.out = e_x / e_x.sum(axis=1)[:, None]
        return self.out.reshape(self.in_shape)

    def backprop(self, grad):
        """Backpropagate grad through the last forward()."""
        assert self.out is not None, 'must run forward() before backprop()'
        grad = grad.reshape(self.work_shape)
        tmp = row_dot(grad, self.out)
        tmp = jnp.broadcast_to(tmp[:, None], self.work_shape)
        gout = self.out * (grad - tmp)
        return gout.reshape(self.in_shape)


class GumbelSoftmax:
    """Softmax with stochastic Gumbel noise (Jang/Maddison et al.)."""

    def __init__(self, tau=1, eps=None, key=None):
        """tau is the temperature; smaller positive values are more discrete."""
        self.tau = tau
        self.eps = eps or float(jnp.finfo(config.precision).eps)
        self.key = key if key is not None else jax.random.key(0)
        self.smax = Softmax()

    def forward(self, x):
        """Gumbel-softmax process on x (consumes PRNG state)."""
        self.key, sub = jax.random.split(self.key)
        eps = self.eps
        u = jax.random.uniform(sub, x.shape)
        g = -jnp.log(-jnp.log(u + eps) + eps)
        yy = (x + g) / self.tau
        return self.smax.forward(yy)

    def backprop(self, protograd):
        """Adjoint of forward()."""
        return self.smax.backprop(protograd) / self.tau


class DiscreteEncoder:
    """Continuous proxy for discrete-valued variables."""

    def __init__(self, estimator, levels):
        """estimator e.g. GumbelSoftmax(); levels int or array of states."""
        if isinstance(levels, int):
            levels = jnp.arange(levels)
        self.est = estimator
        self.levels = jnp.asarray(levels)
        self.tmpshape = None

    def forward(self, x):
        """Forward pass through the continuous proxy."""
        expanded_levels = self.levels[None, :]
        samples = self.est.forward(x)
        tmp = samples * expanded_levels
        self.tmpshape = tmp.shape
        return tmp.sum(axis=-1)

    def backprop(self, grad):
        """Backpropagation through the continuous proxy."""
        expanded_levels = self.levels[None, :]
        tmpbar = jnp.broadcast_to(grad[:, None], self.tmpshape) * expanded_levels
        return self.est.backprop(tmpbar)

    def discretize(self, x):
        """Discrete encoding of x (argmax over the estimator output)."""
        encoded = self.est.forward(x)
        indices = jnp.argmax(encoded, axis=-1)
        return jnp.take(self.levels, indices)


class _AffineActivation:
    """Base for elementwise activations y = f(a (x - x0)) + y0."""

    def __init__(self, a=1, x0=0, y0=0):
        self.a = a
        self.x0 = x0
        self.y0 = y0


class Tanh(_AffineActivation):
    """Affine-scaled hyperbolic tangent."""

    def forward(self, x):
        """tanh(a (x - x0)) + y0."""
        x = x - self.x0
        return 2 / (1 + jnp.exp(-2 * self.a * x)) - 1 + self.y0

    def backprop(self, x):
        """dy/dx at x."""
        fx = self.forward(x) - self.y0
        return self.a * (1 - fx ** 2)


class Arctan(_AffineActivation):
    """Affine-scaled arctangent."""

    def forward(self, x):
        """arctan(a (x - x0)) + y0."""
        return jnp.arctan(self.a * (x - self.x0)) + self.y0

    def backprop(self, x):
        """dy/dx at x."""
        u = self.a * (x - self.x0)
        return self.a / (u ** 2 + 1)


class Softplus(_AffineActivation):
    """Affine-scaled softplus."""

    def forward(self, x):
        """log(1 + exp(a (x - x0))) + y0."""
        return jnp.log(1 + jnp.exp(self.a * (x - self.x0))) + self.y0

    def backprop(self, x):
        """dy/dx at x."""
        return self.a / (1 + jnp.exp(-self.a * (x - self.x0)))


class Sigmoid(_AffineActivation):
    """Affine-scaled logistic sigmoid."""

    def forward(self, x):
        """sigma(a (x - x0)) + y0."""
        return 1 / (1 + jnp.exp(-self.a * (x - self.x0))) + self.y0

    def backprop(self, x):
        """dy/dx at x."""
        sig = self.forward(x) - self.y0
        return self.a * sig * (1 - sig)
