"""Differentiable spatial operators (reference: prysm/x/optym/operators.py)."""
import jax.numpy as jnp


class SpatialGradient2D:
    """Forward-difference spatial partial derivatives and their adjoints."""

    def forward_x(self, x):
        """X spatial gradient of a 2D array."""
        assert x.ndim == 2, 'This operator only works on 2D arrays.'
        end = x.shape[1]
        out = jnp.zeros_like(x)
        return out.at[:, 1:end - 1].set(x[:, 2:end] - x[:, 1:end - 1])

    def adjoint_x(self, xbar):
        """Adjoint of forward_x."""
        assert xbar.ndim == 2, 'This operator only works on 2D arrays.'
        end = xbar.shape[1]
        out = jnp.zeros_like(xbar)
        out = out.at[:, 1:end - 1].add(-xbar[:, 1:end - 1])
        out = out.at[:, 2:end].add(xbar[:, 1:end - 1])
        return out

    def forward_y(self, x):
        """Y spatial gradient of a 2D array."""
        assert x.ndim == 2, 'This operator only works on 2D arrays.'
        end = x.shape[0]
        out = jnp.zeros_like(x)
        return out.at[1:end - 1, :].set(x[2:end, :] - x[1:end - 1, :])

    def adjoint_y(self, xbar):
        """Adjoint of forward_y."""
        assert xbar.ndim == 2, 'This operator only works on 2D arrays.'
        end = xbar.shape[0]
        out = jnp.zeros_like(xbar)
        out = out.at[1:end - 1, :].add(-xbar[1:end - 1, :])
        out = out.at[2:end, :].add(xbar[1:end - 1, :])
        return out
