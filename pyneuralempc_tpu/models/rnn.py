"""Recurrent (GRU) dynamics models via lifted hidden state.

BASELINE config 5 calls for an RNN dynamics model (the reference roadmap
lists RNN support as TODO, ``README.md:23`` — never implemented).  Same
lifting idea as the rolling window (:mod:`.rolling`): the recurrent hidden
state joins the MPC state vector,

    z_t = [x_t, h_t],
    z_{t+1} = [ x_t + f_out(h_{t+1}),  h_{t+1} ],
    h_{t+1} = GRU(h_t, [x_t, u_t]),

so the transcription stays first-order Markov, stage sparsity is preserved,
every KKT backend works unchanged, and all derivatives (including through
the gate nonlinearities) come from autodiff.  Box bounds apply to the
physical block; the hidden block is unbounded.

The GRU cell is a plain params-pytree implementation (no flax dependency
on the hot path) with bf16-able matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..core.problem import Box, Dims
from .base import DynamicsModel, _call_user_fn


def gru_init(key, in_dim: int, hidden: int, out_dim: int):
    """GRU cell + linear readout params."""
    k = jax.random.split(key, 4)
    scale = 1.0 / jnp.sqrt(hidden + in_dim)

    def mat(kk, shape):
        return jax.random.uniform(kk, shape, jnp.float32, -scale, scale)

    return {
        "wz": mat(k[0], (in_dim + hidden, hidden)),
        "wr": mat(k[1], (in_dim + hidden, hidden)),
        "wh": mat(k[2], (in_dim + hidden, hidden)),
        "bz": jnp.zeros((hidden,)), "br": jnp.zeros((hidden,)),
        "bh": jnp.zeros((hidden,)),
        "wo": mat(k[3], (hidden, out_dim)),
        "bo": jnp.zeros((out_dim,)),
    }


def gru_step(params, h, inp):
    """One GRU update, batched over leading axes: h (…, nh), inp (…, ni)."""
    hx = jnp.concatenate([inp, h], axis=-1)
    dot = lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(dot(hx, params["wz"]) + params["bz"])
    r = jax.nn.sigmoid(dot(hx, params["wr"]) + params["br"])
    hxr = jnp.concatenate([inp, r * h], axis=-1)
    h_tilde = jnp.tanh(dot(hxr, params["wh"]) + params["bh"])
    return (1.0 - z) * h + z * h_tilde


@dataclasses.dataclass(frozen=True)
class GRUDynamics:
    """Lifted GRU dynamics bundle (use ``.model`` with integrator='direct')."""

    model: DynamicsModel
    x_dim: int
    u_dim: int
    hidden: int

    def lift(self, x0, h0=None) -> jnp.ndarray:
        h0 = jnp.zeros((self.hidden,)) if h0 is None else jnp.asarray(h0)
        return jnp.concatenate([jnp.asarray(x0), h0])

    def head(self, Z) -> jnp.ndarray:
        return Z[..., : self.x_dim]

    def box(self, states_constraint, control_constraint,
            hidden_bound: float = 10.0) -> Box:
        """Physical bounds + loose symmetric bounds on the hidden block
        (keeps the barrier well-scaled; GRU hiddens live in (-1, 1))."""
        hb = [[-hidden_bound, hidden_bound]] * self.hidden
        return Box.make(list(states_constraint) + hb, control_constraint)

    def head_objective(self, fn: Callable) -> Callable:
        def wrapped(Z, u, p=None, tvp=None):
            return _call_user_fn(fn, self.head(Z), u, p, tvp)
        return wrapped

    def init_params(self, key):
        return gru_init(key, self.x_dim + self.u_dim, self.hidden,
                        self.x_dim)


def gru_dynamics(x_dim: int, u_dim: int, hidden: int = 16,
                 p_dim: int = 0, tvp_dim: int = 0,
                 name: str = "gru") -> GRUDynamics:
    """Build a lifted GRU dynamics model: x_{t+1} = x_t + W_o h_{t+1}."""
    nz = x_dim + hidden

    def fn(z, u, p, tvp, params):
        x, h = z[:, :x_dim], z[:, x_dim:]
        inp = jnp.concatenate([x, u], axis=-1)
        h_new = gru_step(params, h, inp)
        dx = jnp.dot(h_new, params["wo"],
                     preferred_element_type=jnp.float32) + params["bo"]
        return jnp.concatenate([x + dx, h_new], axis=-1)

    lifted = DynamicsModel(fn=fn, dims=Dims(nz, u_dim, p_dim, tvp_dim),
                           name=name)
    return GRUDynamics(model=lifted, x_dim=x_dim, u_dim=u_dim,
                       hidden=hidden)


# ---- LSTM (Keras-compatible cell layout, for artifact import) ----


def lstm_init(key, in_dim: int, hidden: int, out_dim: int):
    """LSTM cell + linear readout params in the Keras weight layout:
    ``wk`` (in, 4u), ``wr`` (u, 4u), ``b`` (4u,) with gate order
    [input, forget, cell, output] — so :func:`~pyneuralempc_tpu.models.
    importers.load_keras_lstm_h5` copies weights verbatim."""
    k = jax.random.split(key, 3)
    scale = 1.0 / jnp.sqrt(hidden + in_dim)

    def mat(kk, shape):
        return jax.random.uniform(kk, shape, jnp.float32, -scale, scale)

    b = jnp.zeros((4 * hidden,))
    # unit forget-gate bias (Keras unit_forget_bias=True default)
    b = b.at[hidden: 2 * hidden].set(1.0)
    return {
        "wk": mat(k[0], (in_dim, 4 * hidden)),
        "wr": mat(k[1], (hidden, 4 * hidden)),
        "b": b,
        "wo": mat(k[2], (hidden, out_dim)),
        "bo": jnp.zeros((out_dim,)),
    }


def lstm_step(params, h, c, inp):
    """One LSTM update (Keras gate order/semantics), batched over leading
    axes: h/c (…, nh), inp (…, ni)."""
    nh = h.shape[-1]
    dot = lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)
    gates = dot(inp, params["wk"]) + dot(h, params["wr"]) + params["b"]
    i = jax.nn.sigmoid(gates[..., :nh])
    f = jax.nn.sigmoid(gates[..., nh: 2 * nh])
    g = jnp.tanh(gates[..., 2 * nh: 3 * nh])
    o = jax.nn.sigmoid(gates[..., 3 * nh:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


@dataclasses.dataclass(frozen=True)
class LSTMDynamics:
    """Lifted LSTM dynamics bundle (use ``.model`` with integrator='direct').

    Same lifting as :class:`GRUDynamics` but with both recurrent carries in
    the MPC state: z = [x, h, c].  This is the import target for trained
    Keras ``Sequential([LSTM, Dense])`` dynamics surrogates — the lifted
    state keeps the transcription first-order Markov where the reference
    would have needed yet another projection-matrix scheme
    (``model/tensorflow.py:131-340``)."""

    model: DynamicsModel
    x_dim: int
    u_dim: int
    hidden: int
    mode: str = "delta"      # readout: x+Wo·h ("delta") or Wo·h ("direct")

    def lift(self, x0, h0=None, c0=None) -> jnp.ndarray:
        h0 = jnp.zeros((self.hidden,)) if h0 is None else jnp.asarray(h0)
        c0 = jnp.zeros((self.hidden,)) if c0 is None else jnp.asarray(c0)
        return jnp.concatenate([jnp.asarray(x0), h0, c0])

    def head(self, Z) -> jnp.ndarray:
        return Z[..., : self.x_dim]

    def box(self, states_constraint, control_constraint,
            hidden_bound: float = 10.0) -> Box:
        hb = [[-hidden_bound, hidden_bound]] * (2 * self.hidden)
        return Box.make(list(states_constraint) + hb, control_constraint)

    def head_objective(self, fn: Callable) -> Callable:
        def wrapped(Z, u, p=None, tvp=None):
            return _call_user_fn(fn, self.head(Z), u, p, tvp)
        return wrapped

    def init_params(self, key):
        return lstm_init(key, self.x_dim + self.u_dim, self.hidden,
                         self.x_dim)


def lstm_dynamics(x_dim: int, u_dim: int, hidden: int = 16,
                  p_dim: int = 0, tvp_dim: int = 0, mode: str = "delta",
                  name: str = "lstm") -> LSTMDynamics:
    """Build a lifted LSTM dynamics model (z = [x, h, c])."""
    if mode not in ("delta", "direct"):
        raise ValueError(f"unknown readout mode {mode!r}")
    nz = x_dim + 2 * hidden

    def fn(z, u, p, tvp, params):
        x = z[:, :x_dim]
        h = z[:, x_dim: x_dim + hidden]
        c = z[:, x_dim + hidden:]
        inp = jnp.concatenate([x, u], axis=-1)
        h_new, c_new = lstm_step(params, h, c, inp)
        out = jnp.dot(h_new, params["wo"],
                      preferred_element_type=jnp.float32) + params["bo"]
        x_next = x + out if mode == "delta" else out
        return jnp.concatenate([x_next, h_new, c_new], axis=-1)

    lifted = DynamicsModel(fn=fn, dims=Dims(nz, u_dim, p_dim, tvp_dim),
                           name=name)
    return LSTMDynamics(model=lifted, x_dim=x_dim, u_dim=u_dim,
                        hidden=hidden, mode=mode)


def fit_gru_on_sequences(gd: GRUDynamics, X_seqs, U_seqs, steps: int = 2000,
                         lr: float = 1e-3, key=None) -> Tuple[dict, float]:
    """Teacher-forced sequence fitting: X_seqs (N, T+1, x_dim),
    U_seqs (N, T, u_dim) — returns (params, final mse)."""
    import optax

    key = jax.random.PRNGKey(0) if key is None else key
    params = gd.init_params(key)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def rollout_loss(p, xs, us):
        def step(h, xu):
            x_t, u_t, x_next = xu
            inp = jnp.concatenate([x_t, u_t])
            h_new = gru_step(p, h, inp)
            pred = x_t + jnp.dot(h_new, p["wo"]) + p["bo"]
            return h_new, jnp.sum((pred - x_next) ** 2)

        h0 = jnp.zeros((gd.hidden,))
        _, errs = jax.lax.scan(step, h0, (xs[:-1], us, xs[1:]))
        return jnp.mean(errs)

    def loss(p):
        return jnp.mean(jax.vmap(lambda xs, us: rollout_loss(p, xs, us))(
            X_seqs, U_seqs))

    def train_step(carry, _):
        p, s = carry
        l, g = jax.value_and_grad(loss)(p)
        upd, s = opt.update(g, s)
        return (optax.apply_updates(p, upd), s), l

    (params, _), losses = jax.lax.scan(train_step, (params, opt_state),
                                       None, length=steps)
    return params, float(losses[-1])

# ---- Keras-compatible GRU cell (for artifact import) ----


def keras_gru_step(params, h, inp, reset_after: bool = True):
    """One GRU update with tf.keras semantics/weight layout: ``wk``
    (in, 3u), ``wr`` (u, 3u), gate order [z, r, h], bias (2, 3u) when
    ``reset_after`` (the tf.keras default — the reset gate multiplies the
    *post-matmul* recurrent term) else (3u,).  h_new = z·h + (1−z)·h̃
    (note: Keras keeps the OLD state through z, opposite of
    :func:`gru_step`'s convention)."""
    nh = h.shape[-1]
    dot = lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)
    gx = dot(inp, params["wk"])
    gh = dot(h, params["wr"])
    b = params["b"]
    if reset_after:
        bx, bh = b[0], b[1]
    else:
        bx, bh = b, jnp.zeros_like(b)
    z = jax.nn.sigmoid(gx[..., :nh] + gh[..., :nh] + bx[..., :nh]
                       + bh[..., :nh])
    r = jax.nn.sigmoid(gx[..., nh:2 * nh] + gh[..., nh:2 * nh]
                       + bx[..., nh:2 * nh] + bh[..., nh:2 * nh])
    if reset_after:
        hh = jnp.tanh(gx[..., 2 * nh:] + bx[..., 2 * nh:]
                      + r * (gh[..., 2 * nh:] + bh[..., 2 * nh:]))
    else:
        hh = jnp.tanh(gx[..., 2 * nh:] + bx[..., 2 * nh:]
                      + dot(r * h, params["wr"][:, 2 * nh:]))
    return z * h + (1.0 - z) * hh


def keras_gru_dynamics(x_dim: int, u_dim: int, hidden: int,
                       mode: str = "delta", reset_after: bool = True,
                       p_dim: int = 0, tvp_dim: int = 0,
                       name: str = "keras_gru") -> GRUDynamics:
    """Lifted GRU dynamics with the KERAS cell (z = [x, h]) — the import
    target of :func:`~pyneuralempc_tpu.models.importers.load_keras_gru_h5`.
    params: {"wk", "wr", "b", "wo", "bo"} in Keras layout."""
    if mode not in ("delta", "direct"):
        raise ValueError(f"unknown readout mode {mode!r}")
    nz = x_dim + hidden

    def fn(z, u, p, tvp, params):
        x, h = z[:, :x_dim], z[:, x_dim:]
        inp = jnp.concatenate([x, u], axis=-1)
        h_new = keras_gru_step(params, h, inp, reset_after=reset_after)
        out = jnp.dot(h_new, params["wo"],
                      preferred_element_type=jnp.float32) + params["bo"]
        x_next = x + out if mode == "delta" else out
        return jnp.concatenate([x_next, h_new], axis=-1)

    lifted = DynamicsModel(fn=fn, dims=Dims(nz, u_dim, p_dim, tvp_dim),
                           name=name)
    return GRUDynamics(model=lifted, x_dim=x_dim, u_dim=u_dim,
                       hidden=hidden)


# ---- stacked LSTM (multi-layer recurrent import) ----


@dataclasses.dataclass(frozen=True)
class StackedLSTMDynamics:
    """Lifted multi-layer LSTM: z = [x, h₁, c₁, …, h_L, c_L].  Layer ℓ's
    per-step input is layer ℓ−1's new hidden state (layer 1 reads
    [x, u]), exactly tf.keras ``Sequential([LSTM, …, LSTM, Dense])`` with
    ``return_sequences=True`` between layers.  All carries join the MPC
    state, so stage sparsity and every KKT backend are preserved
    (the reference's rolling-window projections could not express this —
    ``model/tensorflow.py:131-340``)."""

    model: DynamicsModel
    x_dim: int
    u_dim: int
    hiddens: Tuple[int, ...]
    mode: str = "delta"

    def lift(self, x0, carries=None) -> jnp.ndarray:
        if carries is None:
            carries = jnp.zeros((2 * sum(self.hiddens),))
        return jnp.concatenate([jnp.asarray(x0), jnp.asarray(carries)])

    def head(self, Z) -> jnp.ndarray:
        return Z[..., : self.x_dim]

    def box(self, states_constraint, control_constraint,
            hidden_bound: float = 10.0) -> Box:
        hb = [[-hidden_bound, hidden_bound]] * (2 * sum(self.hiddens))
        return Box.make(list(states_constraint) + hb, control_constraint)

    def head_objective(self, fn: Callable) -> Callable:
        def wrapped(Z, u, p=None, tvp=None):
            return _call_user_fn(fn, self.head(Z), u, p, tvp)
        return wrapped


def stacked_lstm_dynamics(x_dim: int, u_dim: int, hiddens,
                          mode: str = "delta", p_dim: int = 0,
                          tvp_dim: int = 0,
                          name: str = "stacked_lstm") -> StackedLSTMDynamics:
    """Build a lifted stacked-LSTM dynamics model.  params:
    {"layers": [{"wk","wr","b"}, …], "wo", "bo"} (Keras layouts)."""
    if mode not in ("delta", "direct"):
        raise ValueError(f"unknown readout mode {mode!r}")
    hiddens = tuple(int(h) for h in hiddens)
    nz = x_dim + 2 * sum(hiddens)

    def fn(z, u, p, tvp, params):
        x = z[:, :x_dim]
        off = x_dim
        inp = jnp.concatenate([x, u], axis=-1)
        new_carries = []
        for lp, nh in zip(params["layers"], hiddens):
            h = z[:, off: off + nh]
            c = z[:, off + nh: off + 2 * nh]
            off += 2 * nh
            h_new, c_new = lstm_step(lp, h, c, inp)
            new_carries.extend([h_new, c_new])
            inp = h_new
        out = jnp.dot(inp, params["wo"],
                      preferred_element_type=jnp.float32) + params["bo"]
        x_next = x + out if mode == "delta" else out
        return jnp.concatenate([x_next] + new_carries, axis=-1)

    lifted = DynamicsModel(fn=fn, dims=Dims(nz, u_dim, p_dim, tvp_dim),
                           name=name)
    return StackedLSTMDynamics(model=lifted, x_dim=x_dim, u_dim=u_dim,
                               hiddens=hiddens, mode=mode)
