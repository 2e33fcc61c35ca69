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
# layers that are identity at inference time and may appear in a chain
_SKIP_LAYERS = ("InputLayer", "Dropout")


def _ordered_layers(cfg):
    """Model config -> ordered layer-config list.

    Sequential configs list layers in order already; Functional/Model
    configs carry a graph (``inbound_nodes``) which we require to be a
    single chain — walked back from the output layer.  Branching graphs
    (multi-input blocks, skip connections) raise: the reference wrapped
    arbitrary Keras models by *executing TF live*
    (``model/tensorflow.py:39-51``); a weights-only importer can only
    reproduce architectures it understands.
    """
    top = cfg.get("class_name", "Sequential")
    layers = (cfg["config"]["layers"] if isinstance(cfg["config"], dict)
              else cfg["config"])
    if top not in ("Functional", "Model"):
        return layers

    by_name = {}
    for l in layers:
        name = l.get("name") or l["config"]["name"]
        by_name[name] = l

    def parents(l):
        """Layer names referenced by inbound_nodes — tolerant of both the
        legacy nested-list format and the newer keras-tensor dict format."""
        found = []

        def walk(node):
            if isinstance(node, str):
                if node in by_name:
                    found.append(node)
            elif isinstance(node, dict):
                for v in node.values():
                    walk(v)
            elif isinstance(node, (list, tuple)):
                for v in node:
                    walk(v)

        walk(l.get("inbound_nodes", []))
        return found

    out_spec = cfg["config"].get("output_layers", [])
    flat = []

    def names_in(node):
        if isinstance(node, str) and node in by_name:
            flat.append(node)
        elif isinstance(node, (list, tuple)):
            for v in node:
                names_in(v)
        elif isinstance(node, dict):
            for v in node.values():
                names_in(v)

    names_in(out_spec)
    if len(flat) != 1:
        raise ValueError(
            f"functional model must have exactly one output layer, got "
            f"{flat or out_spec}")
    chain = []
    cur = flat[0]
    seen = set()
    while True:
        if cur in seen:
            raise ValueError("cycle in functional model graph")
        seen.add(cur)
        l = by_name[cur]
        chain.append(l)
        ps = [p for p in parents(l) if p != cur]
        if not ps:
            break
        if len(set(ps)) > 1:
            raise ValueError(
                f"layer {cur!r} has multiple inputs {sorted(set(ps))}; "
                "only single-chain functional models are importable")
        cur = ps[0]
    return list(reversed(chain))


def _layer_weights(weights, name):
    """Weight group for a layer — tf.keras nests it as
    ``model_weights/<name>/<name>`` but some writers flatten it."""
    grp = weights[name]
    if "kernel:0" in grp:
        return grp
    if name in grp:
        return grp[name]
    subs = list(grp.keys())
    if len(subs) == 1:
        return grp[subs[0]]
    raise ValueError(f"cannot locate weights for layer {name!r}")


def _parse_dense_stack(cfg, weights):
    """Ordered (Dense params, activations) from a Sequential or single-chain
    Functional config; Activation layers fold into the preceding Dense."""
    import jax.numpy as jnp

    params, acts = [], []
    for l in _ordered_layers(cfg):
        cls = l["class_name"]
        if cls in _SKIP_LAYERS:
            continue
        if cls == "Activation":
            if not acts:
                raise ValueError("Activation layer before any Dense layer")
            a = l["config"].get("activation", "linear")
            if a not in _KERAS_ACTS:
                raise ValueError(f"unsupported Keras activation {a!r}")
            acts[-1] = _KERAS_ACTS[a]
            continue
        if cls != "Dense":
            raise ValueError(
                f"unsupported layer {cls!r} in Dense-stack import "
                "(LSTM nets: use load_keras_lstm_h5)")
        a = l["config"].get("activation", "linear")
        if a not in _KERAS_ACTS:
            raise ValueError(f"unsupported Keras activation {a!r}")
        acts.append(_KERAS_ACTS[a])
        name = l["config"]["name"]
        grp = _layer_weights(weights, name)
        params.append({"w": jnp.asarray(np.asarray(grp["kernel:0"])),
                       "b": jnp.asarray(np.asarray(grp["bias:0"]))})
    if not params:
        raise ValueError("no Dense layers found in h5 model config")
    return params, acts


def load_keras_h5(path: str, x_dim: int, u_dim: int, p_dim: int = 0,
                  tvp_dim: int = 0, compute_dtype=None,
                  out_dim: int = None) -> Tuple[MLPDynamics, list]:
    """Load a tf.keras Dense-stack .h5 into (MLPDynamics, params).

    Accepts Sequential models and single-chain Functional-API models
    (InputLayer → Dense/Activation/Dropout chain).  Validates input/output
    dims against the declared state/control split (the reference's check at
    ``model/tensorflow.py:17-24``).
    """
    import h5py

    with h5py.File(path, "r") as f:
        cfg = json.loads(f.attrs["model_config"])
        params, acts = _parse_dense_stack(cfg, f["model_weights"])

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


def load_keras_lstm_h5(path: str, x_dim: int, u_dim: int,
                       mode: str = "delta"):
    """Load a tf.keras ``LSTM(units) → Dense(x_dim)`` .h5 into a lifted
    :class:`~pyneuralempc_tpu.models.rnn.LSTMDynamics` (+ params).

    The trained net consumes per-step features ``[x_t, u_t]`` (kernel input
    dim must equal x_dim + u_dim) and reads the hidden state out through a
    single linear Dense; ``mode`` selects whether that readout is a state
    delta or the next state.  The recurrent carries (h, c) join the MPC
    state vector, so the import lands on the same lifted-RNN solve path as
    :func:`~pyneuralempc_tpu.models.rnn.gru_dynamics` — the reference
    wrapped recurrent-ish models via rolling-window projection matrices
    instead (``model/tensorflow.py:131-340``).
    """
    import h5py
    import jax.numpy as jnp
    from .rnn import LSTMDynamics, lstm_dynamics

    with h5py.File(path, "r") as f:
        cfg = json.loads(f.attrs["model_config"])
        layers = _ordered_layers(cfg)
        lstm_cfgs = [l for l in layers if l["class_name"] == "LSTM"]
        dense_cfgs = [l for l in layers if l["class_name"] == "Dense"]
        if len(lstm_cfgs) != 1 or len(dense_cfgs) != 1:
            raise ValueError(
                "expected exactly one LSTM and one Dense layer, got "
                f"{len(lstm_cfgs)} LSTM / {len(dense_cfgs)} Dense")
        if dense_cfgs[0]["config"].get("activation", "linear") != "linear":
            raise ValueError("LSTM readout Dense must be linear")
        weights = f["model_weights"]
        lname = lstm_cfgs[0]["config"]["name"]
        grp = weights[lname]
        # tf.keras nests LSTM vars one level deeper: <name>/<name>/lstm_cell
        while "kernel:0" not in grp:
            subs = [k for k in grp.keys()]
            if len(subs) != 1:
                raise ValueError(f"cannot locate LSTM weights under {lname}")
            grp = grp[subs[0]]
        wk = np.asarray(grp["kernel:0"])
        wr = np.asarray(grp["recurrent_kernel:0"])
        b = np.asarray(grp["bias:0"])
        dgrp = _layer_weights(weights, dense_cfgs[0]["config"]["name"])
        wo = np.asarray(dgrp["kernel:0"])
        bo = np.asarray(dgrp["bias:0"])

    hidden = wr.shape[0]
    if wk.shape != (x_dim + u_dim, 4 * hidden):
        raise ValueError(
            f"LSTM kernel shape {wk.shape} != "
            f"({x_dim + u_dim}, {4 * hidden}) for x+u per-step input")
    if wo.shape != (hidden, x_dim) or bo.shape != (x_dim,):
        raise ValueError(
            f"readout Dense shape {wo.shape} != ({hidden}, {x_dim})")

    ld: LSTMDynamics = lstm_dynamics(x_dim=x_dim, u_dim=u_dim,
                                     hidden=hidden, mode=mode,
                                     name=f"keras_lstm:{path}")
    params = {"wk": jnp.asarray(wk), "wr": jnp.asarray(wr),
              "b": jnp.asarray(b), "wo": jnp.asarray(wo),
              "bo": jnp.asarray(bo)}
    return ld, params


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
