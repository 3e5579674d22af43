"""Loss / optimizer parity vs torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from video_captioning_tpu.config import Config
from video_captioning_tpu.training import losses, optim


def test_label_smoothed_ce_matches_torch():
    rs = np.random.RandomState(0)
    B, T, V = 4, 6, 11
    logits = rs.randn(B, T, V).astype(np.float32)
    targets = rs.randint(0, V, size=(B, T))
    targets[0, 4:] = 0  # PAD tail
    targets[2, 2:] = 0

    ours = float(
        losses.label_smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), pad_idx=0, label_smoothing=0.1
        )
    )
    crit = torch.nn.CrossEntropyLoss(ignore_index=0, label_smoothing=0.1)
    theirs = float(
        crit(
            torch.from_numpy(logits).reshape(-1, V),
            torch.from_numpy(targets).reshape(-1),
        )
    )
    assert abs(ours - theirs) < 1e-5


def test_ce_no_smoothing_matches_torch():
    rs = np.random.RandomState(1)
    logits = rs.randn(3, 5, 7).astype(np.float32)
    targets = rs.randint(1, 7, size=(3, 5))
    ours = float(
        losses.label_smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), pad_idx=0, label_smoothing=0.0
        )
    )
    crit = torch.nn.CrossEntropyLoss(ignore_index=0)
    theirs = float(
        crit(torch.from_numpy(logits).reshape(-1, 7), torch.from_numpy(targets).reshape(-1))
    )
    assert abs(ours - theirs) < 1e-5


def _run_optimizer_parity(name, torch_opt_factory, steps=5):
    """Same quadratic-ish objective optimized by ours and torch."""
    cfg = Config()
    cfg.training.optimizer = name
    cfg.training.learning_rate = 1e-2
    cfg.training.weight_decay = 1e-2
    cfg.training.gradient_clip_norm = 0.5

    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    target = np.ones((4, 3), dtype=np.float32)

    params = {"w": jnp.asarray(w0)}
    tx = optim.build_optimizer(cfg)
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((p["w"] - target) ** 2)

    t_w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    t_opt = torch_opt_factory([t_w], lr=1e-2, weight_decay=1e-2)

    for _ in range(steps):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

        t_opt.zero_grad()
        t_loss = ((t_w - torch.from_numpy(target)) ** 2).sum()
        t_loss.backward()
        torch.nn.utils.clip_grad_norm_([t_w], 0.5)
        t_opt.step()

    np.testing.assert_allclose(
        np.asarray(params["w"]), t_w.detach().numpy(), rtol=2e-4, atol=2e-5
    )


def test_adam_matches_torch():
    _run_optimizer_parity("adam", torch.optim.Adam)


def test_adamw_matches_torch():
    _run_optimizer_parity("adamw", torch.optim.AdamW)


def test_sgd_matches_torch():
    def factory(ps, lr, weight_decay):
        return torch.optim.SGD(ps, lr=lr, momentum=0.9, weight_decay=weight_decay)

    _run_optimizer_parity("sgd", factory)


def test_cosine_schedule_matches_torch():
    cfg = Config()
    cfg.training.scheduler = "cosine"
    cfg.training.num_epochs = 10
    cfg.training.learning_rate = 1e-3

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-3)
    sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10, eta_min=1e-5)
    for epoch in range(10):
        ours = optim.lr_at_epoch(cfg, epoch)
        theirs = opt.param_groups[0]["lr"]
        assert abs(ours - theirs) < 1e-9, (epoch, ours, theirs)
        sch.step()


def test_step_schedule_matches_torch():
    cfg = Config()
    cfg.training.scheduler = "step"
    cfg.training.num_epochs = 9
    cfg.training.learning_rate = 1e-3

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-3)
    sch = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.1)
    for epoch in range(9):
        ours = optim.lr_at_epoch(cfg, epoch)
        theirs = opt.param_groups[0]["lr"]
        assert abs(ours - theirs) < 1e-9, (epoch, ours, theirs)
        sch.step()


def test_plateau_scheduler_matches_torch():
    cfg = Config()
    metrics = [0.1, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.3, 0.3, 0.3]

    ours = optim.PlateauScheduler(lr=1e-3)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-3)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=5
    )
    for m in metrics:
        lr_ours = ours.step(m)
        sch.step(m)
        lr_torch = opt.param_groups[0]["lr"]
        assert abs(lr_ours - lr_torch) < 1e-9, (m, lr_ours, lr_torch)


def test_set_learning_rate_roundtrip():
    cfg = Config()
    tx = optim.build_optimizer(cfg)
    params = {"w": jnp.zeros((2, 2))}
    state = tx.init(params)
    assert abs(optim.get_learning_rate(state) - cfg.training.learning_rate) < 1e-9
    state = optim.set_learning_rate(state, 5e-5)
    assert abs(optim.get_learning_rate(state) - 5e-5) < 1e-9
    # state still usable
    grads = {"w": jnp.ones((2, 2))}
    updates, state = tx.update(grads, state, params)
    assert updates["w"].shape == (2, 2)


def test_frozen_encoder_mask():
    """optax-masked freezing: encoder params get zero updates (TPU-native
    equivalent of reference freeze_encoder, video_captioning_model.py:308)."""
    cfg = Config()
    tx = optim.build_optimizer(cfg, frozen_prefixes=("encoder",))
    params = {"encoder": {"w": jnp.ones((2, 2))}, "decoder": {"w": jnp.ones((2, 2))}}
    state = tx.init(params)
    grads = {"encoder": {"w": jnp.ones((2, 2))}, "decoder": {"w": jnp.ones((2, 2))}}
    updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["encoder"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["decoder"]["w"]).max()) > 0.0
    # LR scheduling still reaches the inject state through the mask.
    state = optim.set_learning_rate(state, 1e-5)
    assert abs(optim.get_learning_rate(state) - 1e-5) < 1e-9


def test_trainer_plateau_scheduler_path():
    """Trainer plateau wiring: LR halves after patience exhausted."""
    sch = optim.PlateauScheduler(lr=1e-3, patience=2)
    lrs = [sch.step(0.5)]          # new best
    for _ in range(3):
        lrs.append(sch.step(0.4))  # no improvement x3 > patience 2
    assert lrs[-1] == 5e-4
