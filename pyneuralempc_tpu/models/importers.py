"""Weight importers: Keras .h5 and torch state_dicts -> MLPDynamics params.

TPU-native replacement for the reference's live-TensorFlow dependency
(``/root/reference/pyNeuralEMPC/model/tensorflow.py:8-51`` wraps a running
Keras model and calls ``model.predict`` inside the solver loop).  Here the
framework never executes TF or torch at solve time: weights are read once
into a JAX pytree and the MLP forward is pure JAX.  Supports the reference's
own artifact format (``examples/lotka_volterra/nn_model.h5``: Sequential
Dense stacks saved by tf.keras, weights under ``model_weights/<layer>/
<layer>/{kernel,bias}:0``).
"""

from __future__ import annotations

import json
from typing import Tuple

import numpy as np

from ..core.problem import Dims
from .mlp import MLPDynamics

_KERAS_ACTS = {"tanh": "tanh", "relu": "relu", "linear": "linear",
               "sigmoid": "sigmoid", "gelu": "gelu", "swish": "swish"}


def load_keras_h5(path: str, x_dim: int, u_dim: int, p_dim: int = 0,
                  tvp_dim: int = 0, compute_dtype=None,
                  out_dim: int = None) -> Tuple[MLPDynamics, list]:
    """Load a tf.keras Sequential-of-Dense .h5 into (MLPDynamics, params).

    Validates input/output dims against the declared state/control split
    (the reference's check at ``model/tensorflow.py:17-24``).
    """
    import h5py
    import jax.numpy as jnp

    with h5py.File(path, "r") as f:
        cfg = json.loads(f.attrs["model_config"])
        layers_cfg = (cfg["config"]["layers"] if isinstance(cfg["config"], dict)
                      else cfg["config"])
        dense_cfgs = [l for l in layers_cfg
                      if l["class_name"] == "Dense"]
        if not dense_cfgs:
            raise ValueError("no Dense layers found in h5 model config")
        acts = []
        for l in dense_cfgs:
            a = l["config"].get("activation", "linear")
            if a not in _KERAS_ACTS:
                raise ValueError(f"unsupported Keras activation {a!r}")
            acts.append(_KERAS_ACTS[a])

        weights = f["model_weights"]
        params = []
        for l in dense_cfgs:
            name = l["config"]["name"]
            grp = weights[name][name]
            W = np.asarray(grp["kernel:0"])
            b = np.asarray(grp["bias:0"])
            params.append({"w": jnp.asarray(W), "b": jnp.asarray(b)})

    return _wrap(params, acts, x_dim, u_dim, p_dim, tvp_dim, compute_dtype,
                 name=f"keras:{path.rsplit('/', 1)[-1]}", out_dim=out_dim)


def load_torch_mlp(state_dict, x_dim: int, u_dim: int, p_dim: int = 0,
                   tvp_dim: int = 0, activation: str = "tanh",
                   compute_dtype=None) -> Tuple[MLPDynamics, list]:
    """Convert a torch ``nn.Sequential(nn.Linear...)``-style state_dict.

    torch stores Linear weights as (out, in); transposed here to the
    (in, out) matmul layout.  ``activation`` applies between layers (torch
    functional activations leave no trace in the state_dict).
    """
    import jax.numpy as jnp

    items = [(k, v) for k, v in state_dict.items() if k.endswith(".weight")]
    params = []
    for k, Wt in items:
        base = k[: -len(".weight")]
        W = np.asarray(Wt.detach().cpu().numpy() if hasattr(Wt, "detach")
                       else Wt)
        bias_key = base + ".bias"
        b = state_dict.get(bias_key)
        b = (np.asarray(b.detach().cpu().numpy() if hasattr(b, "detach")
                        else b) if b is not None
             else np.zeros(W.shape[0], W.dtype))
        params.append({"w": jnp.asarray(W.T), "b": jnp.asarray(b)})
    acts = [activation] * (len(params) - 1) + ["linear"]
    return _wrap(params, acts, x_dim, u_dim, p_dim, tvp_dim, compute_dtype,
                 name="torch_mlp")


def _wrap(params, acts, x_dim, u_dim, p_dim, tvp_dim, compute_dtype, name,
          out_dim=None):
    import jax.numpy as jnp
    from .mlp import mlp_apply

    in_dim = params[0]["w"].shape[0]
    got_out = params[-1]["w"].shape[1]
    expected_out = x_dim if out_dim is None else out_dim
    expected_in = x_dim + u_dim + tvp_dim + p_dim
    if in_dim != expected_in:
        raise ValueError(
            f"model input dim {in_dim} != x+u+tvp+p dims {expected_in}")
    if got_out != expected_out:
        raise ValueError(
            f"model output dim {got_out} != expected {expected_out}")
    for a, b in zip(params[:-1], params[1:]):
        if a["w"].shape[1] != b["w"].shape[0]:
            raise ValueError("inconsistent layer shapes in imported model")

    dims = Dims(x_dim, u_dim, p_dim, tvp_dim)
    cdt = compute_dtype if compute_dtype is not None else jnp.float32
    activations = tuple(acts)

    def fn(x, u, p, tvp, prm):
        feats = [x, u]
        if tvp is not None and dims.tvp:
            feats.append(tvp)
        if p is not None and dims.p:
            feats.append(jnp.broadcast_to(p, (x.shape[0], dims.p)))
        return mlp_apply(prm, jnp.concatenate(feats, axis=-1), activations,
                         cdt)

    hidden = tuple(int(l["w"].shape[1]) for l in params[:-1])
    model = MLPDynamics(fn=fn, dims=dims, name=name, hidden=hidden,
                        activation=acts[0] if acts else "linear",
                        compute_dtype=cdt)
    return model, params


def load_keras_h5_rolling(path: str, x_dim: int, u_dim: int, window: int,
                          mode: str = "delta", compute_dtype=None):
    """Load a Keras net that consumes a rolling window of states plus the
    current control (the reference's ``KerasTFModelRollingInput``,
    ``model/tensorflow.py:112-174``) into a lifted rolling-window model.

    Expected net input dim: window*x_dim + u_dim; output dim: x_dim.
    Returns (RollingWindow, params).
    """
    from .rolling import rolling_window

    mlp_model, params = load_keras_h5(path, x_dim=window * x_dim,
                                      u_dim=u_dim,
                                      compute_dtype=compute_dtype,
                                      out_dim=x_dim)

    def inner_fn(z, u, p, tvp, prm):
        return mlp_model.fn(z, u, p, tvp, prm)

    rw = rolling_window(inner_fn, x_dim=x_dim, u_dim=u_dim, window=window,
                        mode=mode, name=f"keras_rolling:{path}")
    return rw, params
