"""Learned latency-predictor MLP + trainer.

Reference: speed_models/SpeedModel.py (ConvBlockModel: Linear
in→32→64→128→64→32→1 with ReLUs, kaiming-normal×0.1 init) and
speed_models/train_speed_model.py (80/20 split, SGD+StepLR, relative-
squared-error loss ((s−t)/scale)²/t).

The training data here comes from the on-TPU kernel timing harness
(kernels/timing.py) instead of mobile TFLite benchmark logs — rows are
(ch_in, ch_split, kernel, latency_ms), the same schema as
speed_models/speed_data/data_generate_from_txt.py:83.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


def _kaiming01(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    std = float(np.sqrt(2.0 / fan_in)) * 0.1
    return std * jax.random.normal(key, shape, dtype)


class SpeedPredictor(nn.Module):
    """MLP block-descriptor → latency (ms).

    widths: hidden-layer sizes. The default matches the reference's
    ConvBlockModel (SpeedModel.py:15-20); its S10/S21 checkpoints use a wider
    4-feature generation (128/256/512/256/128) — which the reference itself
    can no longer load (its ``load_state_dict(..., strict=False)`` at
    SpeedModel.py:56 silently drops EVERY tensor on the shape mismatch);
    here the architecture is explicit so those artifacts work."""

    num_feat: int = 3  # (ch_in, ch_split, kernel)
    widths: tuple = (32, 64, 128, 64, 32)

    @nn.compact
    def __call__(self, x):
        for width in self.widths:
            x = nn.relu(nn.Dense(width, kernel_init=_kaiming01)(x))
        return nn.Dense(1, kernel_init=_kaiming01)(x)


def relative_squared_error(pred, target, scale=1.0):
    """((s − t)/scale)² / t (train_speed_model.py:15-19)."""
    return jnp.mean(((pred - target) / scale) ** 2 / jnp.maximum(target, 1e-8))


def train_speed_predictor(
    rows, seed=0, epochs=400, lr=1e-2, batch_size=32, scale=1.0, optimizer="sgd"
):
    """rows: (N, 4) [ch_in, ch_split, kernel, ms]. Returns (params, report).

    80/20 train/val split like the reference trainer. optimizer="sgd" is the
    reference recipe (SGD+momentum+StepLR); "adam" fits the unnormalized
    (ch, ch, k) features much better and is used for the shipped artifacts."""
    rows = np.asarray(rows, dtype=np.float32)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(rows))
    n_train = int(0.8 * len(rows))
    train, val = rows[order[:n_train]], rows[order[n_train:]]

    model = SpeedPredictor(num_feat=3)
    params = model.init(jax.random.key(seed), jnp.zeros((1, 3)))["params"]
    sched = optax.exponential_decay(
        lr,
        transition_steps=max(1, epochs // 4) * max(1, n_train // batch_size),
        decay_rate=0.5,
        staircase=True,
    )
    tx = optax.adam(sched) if optimizer == "adam" else optax.sgd(sched, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = model.apply({"params": p}, xb)[:, 0]
            return relative_squared_error(pred, yb, scale)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(epochs):
        rng.shuffle(train)
        for i in range(0, len(train), batch_size):
            xb = jnp.asarray(train[i : i + batch_size, :3])
            yb = jnp.asarray(train[i : i + batch_size, 3])
            params, opt_state, loss = step(params, opt_state, xb, yb)

    def _eval(split):
        pred = model.apply({"params": params}, jnp.asarray(split[:, :3]))[:, 0]
        rel = jnp.abs(pred - split[:, 3]) / jnp.maximum(split[:, 3], 1e-8)
        return float(jnp.mean(rel))

    report = {"train_rel_err": _eval(train), "val_rel_err": _eval(val) if len(val) else None}
    return params, report


def save_predictor(params, path):
    """Serialize trained predictor params (flax msgpack — the role of the
    reference's speed_models/weights/<device>/<proc>/<proc>.pt)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_predictor(path):
    """Load a serialized predictor → (params, model). The architecture
    (num_feat, hidden widths) is inferred from the saved Dense kernel shapes,
    so one loader serves both the 3-feature default and the reference's wider
    4-feature S10/S21 generation."""
    from flax import serialization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    n_dense = len(raw)
    kernels = [raw[f"Dense_{i}"]["kernel"] for i in range(n_dense)]
    num_feat = int(kernels[0].shape[0])
    widths = tuple(int(k.shape[1]) for k in kernels[:-1])
    model = SpeedPredictor(num_feat=num_feat, widths=widths)
    template = model.init(jax.random.key(0), jnp.zeros((1, num_feat)))["params"]
    return serialization.from_state_dict(template, raw), model


def convert_torch_speed_model(sd):
    """Reference ConvBlockModel state dict (SpeedModel.py:9-60: Linear layers
    fc1,fc2,fc3,fc6,fc7,fc8) → flax params for ``SpeedPredictor``. Returns
    (params, model). torch Linear weight is (out, in); flax Dense kernel is
    (in, out)."""
    names = ("fc1", "fc2", "fc3", "fc6", "fc7", "fc8")
    params = {}
    for i, fc in enumerate(names):
        w = np.asarray(sd[f"{fc}.weight"], np.float32)
        params[f"Dense_{i}"] = {
            "kernel": np.ascontiguousarray(w.T),
            "bias": np.asarray(sd[f"{fc}.bias"], np.float32),
        }
    num_feat = params["Dense_0"]["kernel"].shape[0]
    widths = tuple(params[f"Dense_{i}"]["kernel"].shape[1] for i in range(5))
    return params, SpeedPredictor(num_feat=num_feat, widths=widths)


def packaged_predictor_path(name=None):
    """Checked-in trained predictor for a device kind (None → current
    backend), or None if not shipped."""
    import os

    from mobilesuperresolution_tpu.nas.speed_estimator import SPEED_TABLE_DIR

    if name is None:
        name = jax.devices()[0].device_kind.lower().replace(" ", "_")
    p = os.path.join(SPEED_TABLE_DIR, f"{name}_predictor.msgpack")
    return p if os.path.exists(p) else None


class MLPSpeedEstimator:
    """Predictor-backed estimator (the reference's estimateByMask path that
    its TODO disabled — speed_estimator.py:70-73 — made real).

    Accepts bare params (default 3-feature architecture — the
    ``train_speed_predictor`` output) or the (params, model) pair
    ``load_predictor`` returns."""

    def __init__(self, params, model=None):
        if model is None and isinstance(params, tuple):
            params, model = params
        self.model = model if model is not None else SpeedPredictor(num_feat=3)
        self.params = params
        self._fwd = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)[:, 0]
        )

    def __call__(self, ch_in, ch_split, kernel):
        x = jnp.asarray([[ch_in, ch_split, kernel]], jnp.float32)
        return float(self._fwd(self.params, x)[0])
