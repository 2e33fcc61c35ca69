"""Feed-forward NN dynamics (the "neural" in neural EMPC).

TPU-native replacement for the reference's Keras wrapper
(``/root/reference/pyNeuralEMPC/model/tensorflow.py:8-109`` ``KerasTFModel``):
a pure-JAX MLP whose weights are an explicit pytree threaded through the
solver as runtime data, so a *batch of different models* can be vmapped or
sharded across a mesh.  The forward concatenates ``[x, u, tvp, p]`` features
exactly like the reference input layout (``model/tensorflow.py:39-51``), runs
all H stages as one batched matmul chain (MXU-friendly), and never defines
bespoke ``jacobian``/``hessian`` methods — autodiff handles those at the
rollout level.

Compute dtype: weights are stored in float32; set ``compute_dtype=bfloat16``
to run the matmuls on the MXU in bf16 with float32 accumulation (the solver's
outer linear algebra stays float32 regardless).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.problem import Dims
from .base import DynamicsModel

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
    "sigmoid": jax.nn.sigmoid,
    "linear": lambda x: x,
}


def mlp_init(key, sizes: Sequence[int], dtype=jnp.float32):
    """Glorot-uniform init, matching Keras Dense defaults so imported and
    freshly-initialised nets behave alike."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for k, fan_in, fan_out in zip(keys, sizes[:-1], sizes[1:]):
        limit = jnp.sqrt(6.0 / (fan_in + fan_out))
        W = jax.random.uniform(k, (fan_in, fan_out), dtype, -limit, limit)
        b = jnp.zeros((fan_out,), dtype)
        params.append({"w": W, "b": b})
    return params


def mlp_apply(params, feats, activations: Tuple[str, ...],
              compute_dtype=jnp.float32):
    """Apply the MLP to (T, in_dim) features as one batched matmul chain."""
    h = feats.astype(compute_dtype)
    for layer, act in zip(params, activations):
        w = layer["w"].astype(compute_dtype)
        b = layer["b"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h = _ACTIVATIONS[act](h)
    return h.astype(feats.dtype)


@dataclasses.dataclass(frozen=True)
class MLPDynamics(DynamicsModel):
    """MLP over concatenated ``[x, u, tvp, p]`` features.

    ``hidden``: hidden layer widths; ``activation`` applies to all hidden
    layers, output layer is linear (the reference surrogate is
    3→30(tanh)→30(tanh)→2(linear), see SURVEY §2 row 16).
    """

    hidden: Tuple[int, ...] = ()
    activation: str = "tanh"
    compute_dtype: Any = jnp.float32

    @staticmethod
    def make(x_dim: int, u_dim: int, hidden: Sequence[int],
             p_dim: int = 0, tvp_dim: int = 0, activation: str = "tanh",
             compute_dtype=jnp.float32, name: str = "mlp") -> "MLPDynamics":
        dims = Dims(x_dim, u_dim, p_dim, tvp_dim)
        hidden = tuple(int(h) for h in hidden)
        acts = ("tanh",) * 0  # placeholder, real tuple computed in fn closure
        activations = tuple([activation] * len(hidden) + ["linear"])

        def fn(x, u, p, tvp, params):
            feats = [x, u]
            if tvp is not None and dims.tvp:
                feats.append(tvp)
            if p is not None and dims.p:
                feats.append(jnp.broadcast_to(p, (x.shape[0], dims.p)))
            feats = jnp.concatenate(feats, axis=-1)
            return mlp_apply(params, feats, activations, compute_dtype)

        return MLPDynamics(fn=fn, dims=dims, name=name, hidden=hidden,
                           activation=activation, compute_dtype=compute_dtype)

    @property
    def layer_sizes(self) -> Tuple[int, ...]:
        in_dim = self.dims.x + self.dims.u + self.dims.tvp + self.dims.p
        return (in_dim,) + self.hidden + (self.dims.x,)

    def init_params(self, key):
        return mlp_init(key, self.layer_sizes)
