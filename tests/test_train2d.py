"""2D training integration: micro YOLOX / CenterNet forward -> SimOTA /
gaussian-focal loss -> AdamW step decreases the loss (the CI-scale proof of
the reference's 2D train/QAT capability, tools/2d/train.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from bevformer_tensorrt_tpu.configs.centernet import centernet_micro
from bevformer_tensorrt_tpu.configs.yolox import yolox_micro
from bevformer_tensorrt_tpu.models.detectors.centernet import CenterNet
from bevformer_tensorrt_tpu.models.detectors.yolox import YOLOX
from bevformer_tensorrt_tpu.train.losses2d import (
    centernet_loss_single,
    yolox_loss_single,
)

MAX_GT = 8


@pytest.mark.slow
@pytest.mark.parametrize("family", ["yolox", "centernet"])
def test_micro_train_step_decreases_loss(rng, family):
    if family == "yolox":
        cfg = yolox_micro()
        model = YOLOX(cfg)
    else:
        cfg = centernet_micro()
        model = CenterNet(cfg)
    B = 2
    img = jnp.asarray(
        rng.standard_normal((B, 3, cfg.img_size, cfg.img_size)), jnp.float32
    )
    gb = np.zeros((B, MAX_GT, 4), np.float32)
    gl = np.full((B, MAX_GT), -1, np.int32)
    for i in range(B):
        gb[i, 0] = [8, 8, 40, 40]
        gl[i, 0] = 1
        gb[i, 1] = [30, 20, 60, 50]
        gl[i, 1] = 3
    batch = {
        "image": img,
        "gt_boxes": jnp.asarray(gb),
        "gt_labels": jnp.asarray(gl),
    }

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params, batch):
        outs = model.apply({"params": params, **extra}, batch["image"])
        total = 0.0
        for i in range(B):
            if family == "yolox":
                li = yolox_loss_single(
                    outs, batch["gt_boxes"][i], batch["gt_labels"][i],
                    cfg.num_classes, img_idx=i,
                )
            else:
                li = centernet_loss_single(
                    outs, batch["gt_boxes"][i], batch["gt_labels"][i],
                    cfg.num_classes, stride=4, img_idx=i,
                )
            total = total + li["loss"]
        return total / B

    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        assert np.isfinite(float(loss))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
