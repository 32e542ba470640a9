"""Full `checkpoint.pth.tar` training-resume import round trip.

Builds a REAL reference-format training checkpoint by running the
reference's own models + losses + Adam/LambdaLR recipe (imported from
/root/reference, executed — not copied) for three "epochs" of one batch
each, saves the exact dict trainer.py:580-596 saves, imports it with
train/torch_resume.import_torch_checkpoint, and asserts:

  1. weights, Adam moments and step counts land bit-faithfully in the
     CycleGANState (moment mapping verified leaf-by-leaf through the same
     transposes as the weights);
  2. epoch / best-val bookkeeping and the scheduler-derived lr match;
  3. CONTINUITY: one further full 9-term train step on the same batch
     produces matching generator loss and matching post-step parameters
     on both frameworks (fp32) — i.e. a reference run mid-way through
     training continues on TPU as if it had never stopped.

The torch-side step reproduces modules/trainer.py:447-531 exactly
(6 generator forwards, 9-term G loss, detached D steps, per-epoch
LambdaLR); SSIM uses the in-repo torch re-implementation of
pytorch_msssim (tests/test_ssim_torch_parity.py) since that wheel is not
in this environment.
"""
import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ducosy_tpu.config import LossConfig, ModelConfig, TrainConfig, replace
from ducosy_tpu.models.torch_import import (
    discriminator_params_from_torch,
    generator_params_from_torch,
)
from ducosy_tpu.train.schedule import lr_for_epoch
from ducosy_tpu.train.state import create_state
from ducosy_tpu.train.step import make_train_step
from ducosy_tpu.train.torch_resume import import_torch_checkpoint
from tests.conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")


R_BLOCKS = 2
IMG = 64
BATCH = 2
EPOCHS, DECAY = 6, 2
LR = 2e-4


@pytest.fixture(scope="module")
def torch_env():
    if not reference_available():
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    for name in ("pydicom", "pytorch_msssim", "torchvision",
                 "torchvision.transforms", "torchvision.utils"):
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        for attr in ("SSIM", "save_image", "transforms", "utils"):
            if not hasattr(mod, attr):
                setattr(mod, attr, object)
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from modules.model import Discriminator as TD
        from modules.model import Generator as TG
        from modules.trainer import (
            ContrastAttentionLoss,
            ContrastEdgeLoss,
            ContrastRegionLoss,
            GradientLoss,
        )
    finally:
        sys.path.remove(REFERENCE_DIR)
        for mod in [m for m in sys.modules if m.startswith("modules")]:
            del sys.modules[mod]
    return torch, TG, TD, (GradientLoss, ContrastAttentionLoss,
                           ContrastRegionLoss, ContrastEdgeLoss)


def _torch_ssim(torch, x, y):
    """pytorch_msssim SSIM(data_range=1, channel=1) mean, torch re-impl
    (validated against our JAX ssim in test_ssim_torch_parity)."""
    from tests.test_ssim_torch_parity import _torch_ssim_maps, _window_2d
    ssim_map, _ = _torch_ssim_maps(x, y, _window_2d(), 1.0)
    return ssim_map.mean()


def _torch_train_step(torch, models, opts, losses, batch_np, img_size):
    """One reference train step (modules/trainer.py:447-531), fp32 CPU."""
    G_A2B, G_B2A, D_A, D_B = models
    optimizer_G, optimizer_D_A, optimizer_D_B = opts
    (criterion_GAN, criterion_cycle, criterion_identity, criterion_gradient,
     criterion_ca, criterion_cr, criterion_ce) = losses

    real_A = torch.from_numpy(batch_np["a"])
    real_B = torch.from_numpy(batch_np["b"])
    n = real_A.shape[0]
    valid = torch.ones((n, 1, img_size // 16, img_size // 16))
    fake = torch.zeros((n, 1, img_size // 16, img_size // 16))

    optimizer_G.zero_grad()
    fake_B, fake_A = G_A2B(real_A), G_B2A(real_B)
    id_A, id_B = G_B2A(real_A), G_A2B(real_B)
    loss_id = (criterion_identity(id_A, real_A)
               + criterion_identity(id_B, real_B)) / 2
    loss_GAN = (criterion_GAN(D_B(fake_B), valid)
                + criterion_GAN(D_A(fake_A), valid)) / 2
    rec_A, rec_B = G_B2A(fake_B), G_A2B(fake_A)
    loss_cycle = (criterion_cycle(rec_A, real_A)
                  + criterion_cycle(rec_B, real_B)) / 2
    loss_grad_cycle = (criterion_gradient(rec_A, real_A)
                       + criterion_gradient(rec_B, real_B)) / 2
    loss_grad_id = (criterion_gradient(id_A, real_A)
                    + criterion_gradient(id_B, real_B)) / 2
    loss_ssim = 1 - ((_torch_ssim(torch, rec_A, real_A)
                      + _torch_ssim(torch, rec_B, real_B)) / 2)
    loss_ca = criterion_ca(fake_B, real_B, real_A)
    loss_cr = criterion_cr(fake_B, real_B, real_A)
    loss_ce = criterion_ce(fake_B, real_B, real_A)
    loss_G = (loss_GAN + 10.0 * loss_cycle + 5.0 * loss_id
              + 5.0 * loss_grad_cycle + 2.5 * loss_grad_id
              + 2.0 * loss_ssim + 2.0 * loss_ca + 1.5 * loss_cr
              + 1.0 * loss_ce)
    loss_G.backward()
    optimizer_G.step()

    optimizer_D_A.zero_grad()
    loss_D_A = (criterion_GAN(D_A(real_A), valid)
                + criterion_GAN(D_A(fake_A.detach()), fake)) / 2
    loss_D_A.backward()
    optimizer_D_A.step()

    optimizer_D_B.zero_grad()
    loss_D_B = (criterion_GAN(D_B(real_B), valid)
                + criterion_GAN(D_B(fake_B.detach()), fake)) / 2
    loss_D_B.backward()
    optimizer_D_B.step()
    return float(loss_G.detach()), float((loss_D_A + loss_D_B).detach())


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory, torch_env):
    """3 reference epochs (1 batch each) -> checkpoint.pth.tar + the data."""
    torch, TG, TD, loss_classes = torch_env
    GradientLoss, CA, CR, CE = loss_classes
    torch.manual_seed(0)
    G_A2B = TG(input_channels=1, num_residual_blocks=R_BLOCKS)
    G_B2A = TG(input_channels=1, num_residual_blocks=R_BLOCKS)
    D_A, D_B = TD(), TD()
    optimizer_G = torch.optim.Adam(
        list(G_A2B.parameters()) + list(G_B2A.parameters()),
        lr=LR, betas=(0.5, 0.999))
    optimizer_D_A = torch.optim.Adam(D_A.parameters(), lr=LR,
                                     betas=(0.5, 0.999))
    optimizer_D_B = torch.optim.Adam(D_B.parameters(), lr=LR,
                                     betas=(0.5, 0.999))
    lr_lambda = lambda epoch: 1.0 - max(0, epoch + 1 - DECAY) / (EPOCHS
                                                                 - DECAY)
    scheds = [torch.optim.lr_scheduler.LambdaLR(o, lr_lambda)
              for o in (optimizer_G, optimizer_D_A, optimizer_D_B)]
    losses = (torch.nn.MSELoss(), torch.nn.L1Loss(), torch.nn.L1Loss(),
              GradientLoss(),
              CA(sigma=0.15, min_weight=1.0, max_weight=3.0, blur_kernel=7),
              CR(threshold=0.15, weight=1.5), CE())

    rng = np.random.default_rng(3)
    batches = [
        {"a": rng.uniform(-1, 1, (BATCH, 1, IMG, IMG)).astype(np.float32),
         "b": rng.uniform(-1, 1, (BATCH, 1, IMG, IMG)).astype(np.float32)}
        for _ in range(4)
    ]
    models = (G_A2B, G_B2A, D_A, D_B)
    opts = (optimizer_G, optimizer_D_A, optimizer_D_B)
    for epoch in range(3):
        _torch_train_step(torch, models, opts, losses, batches[epoch], IMG)
        for s in scheds:
            s.step()

    ckpt = {
        "epoch": 2,
        "G_A2B_state_dict": G_A2B.state_dict(),
        "G_B2A_state_dict": G_B2A.state_dict(),
        "D_A_state_dict": D_A.state_dict(),
        "D_B_state_dict": D_B.state_dict(),
        "optimizer_G_state_dict": optimizer_G.state_dict(),
        "optimizer_D_A_state_dict": optimizer_D_A.state_dict(),
        "optimizer_D_B_state_dict": optimizer_D_B.state_dict(),
        "scheduler_G_state_dict": scheds[0].state_dict(),
        "scheduler_D_A_state_dict": scheds[1].state_dict(),
        "scheduler_D_B_state_dict": scheds[2].state_dict(),
        "best_val_loss": 7.125,
        "best_epoch": 2,
        "args": None,
    }
    path = tmp_path_factory.mktemp("resume") / "checkpoint.pth.tar"
    torch.save(ckpt, str(path))
    return str(path), batches, models, opts, losses


def _make_template():
    cfg = replace(TrainConfig(), img_size=IMG, epochs=EPOCHS,
                  decay_epoch=DECAY, lr=LR, compute_dtype="float32")
    from ducosy_tpu.config import RangeConfig
    range_cfg = RangeConfig(name="t", hu_min=-150, hu_max=250,
                            window_center=40, window_width=400,
                            use_cbam=True, mask_types=())
    model_cfg = ModelConfig(num_residual_blocks=R_BLOCKS)
    state, gen, disc = create_state(jax.random.PRNGKey(0), cfg, range_cfg,
                                    model_cfg, img_size=IMG,
                                    dtype=jnp.float32)
    return cfg, state, gen, disc


def test_import_maps_weights_moments_and_bookkeeping(trained_checkpoint):
    path, _, models, opts, _ = trained_checkpoint
    cfg, template, gen, _disc = _make_template()
    state = import_torch_checkpoint(path, template,
                                    num_residual_blocks=R_BLOCKS)

    # ---- bookkeeping
    assert int(state.epoch) == 2
    assert int(state.best_epoch) == 2
    assert float(state.best_val_loss) == pytest.approx(7.125)

    # ---- weights: forward parity of the imported A2B generator
    import torch
    G_A2B = models[0]
    x = np.random.default_rng(5).uniform(-1, 1, (1, 1, IMG, IMG)) \
        .astype(np.float32)
    with torch.no_grad():
        want = G_A2B(torch.from_numpy(x)).numpy()
    got = np.asarray(gen.apply({"params": state.params_g_a2b},
                               jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-5)

    # ---- Adam moments: leaf-exact vs torch through the weight transposes
    optimizer_G = opts[0]
    opt_sd = optimizer_G.state_dict()
    names_a2b = list(G_A2B.state_dict())
    mu_sd = {names_a2b[i]: opt_sd["state"][i]["exp_avg"]
             for i in range(len(names_a2b))}
    want_mu = generator_params_from_torch(mu_sd, R_BLOCKS)
    adam = state.opt_g.inner_state[0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        adam.mu["a2b"], want_mu)
    assert int(adam.count) == 3

    # discriminator B moments + count
    opt_db_sd = opts[2].state_dict()
    names_db = list(models[3].state_dict())
    nu_sd = {names_db[i]: opt_db_sd["state"][i]["exp_avg_sq"]
             for i in range(len(names_db))}
    want_nu = discriminator_params_from_torch(nu_sd)
    adam_db = state.opt_d_b.inner_state[0]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        adam_db.nu, want_nu)
    assert int(adam_db.count) == 3

    # lr primed from the checkpoint's param_groups (scheduler has stepped
    # 3x: factor 1 - max(0, 3+1-2)/(6-2) = 0.5)
    got_lr = float(state.opt_g.hyperparams["learning_rate"])
    assert got_lr == pytest.approx(LR * 0.5)
    # and our per-epoch schedule reproduces it for the resume epoch
    assert lr_for_epoch(LR, int(state.epoch) + 1, EPOCHS, DECAY) == \
        pytest.approx(got_lr)


def test_import_handles_module_prefix_and_sparse_opt_state(torch_env,
                                                           tmp_path):
    """DataParallel-style 'module.'-prefixed state dicts load (the
    reference strips them both directions, trainer.py:381-387), and
    parameters the optimizer never touched fall back to zero moments."""
    import torch
    _t, TG, TD, _losses = torch_env
    torch.manual_seed(1)
    G_A2B, G_B2A = TG(1, R_BLOCKS), TG(1, R_BLOCKS)
    D_A, D_B = TD(), TD()

    def prefixed(m):
        return {f"module.{k}": v for k, v in m.state_dict().items()}

    opt_g = torch.optim.Adam(
        list(G_A2B.parameters()) + list(G_B2A.parameters()), lr=LR,
        betas=(0.5, 0.999))
    # touch only the FIRST generator's params: B2A slots stay stateless
    loss = G_A2B(torch.randn(1, 1, IMG, IMG)).mean()
    opt_g.zero_grad()
    loss.backward()
    opt_g.step()
    ckpt = {
        "epoch": 0,
        "G_A2B_state_dict": prefixed(G_A2B),
        "G_B2A_state_dict": prefixed(G_B2A),
        "D_A_state_dict": prefixed(D_A),
        "D_B_state_dict": prefixed(D_B),
        "optimizer_G_state_dict": opt_g.state_dict(),
    }
    path = tmp_path / "checkpoint.pth.tar"
    torch.save(ckpt, str(path))

    _cfg, template, gen, _d = _make_template()
    state = import_torch_checkpoint(str(path), template,
                                    num_residual_blocks=R_BLOCKS)
    # weights landed despite the prefix. NOTE: the probe input must be
    # non-constant — a constant image has zero variance at every
    # InstanceNorm, whose output is then amplified rounding noise
    # (1/sqrt(eps) gain), diverging across backends by construction.
    x = np.random.default_rng(9).uniform(
        -1, 1, (1, 1, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        want = G_A2B(torch.from_numpy(x)).numpy()
    got = np.asarray(gen.apply({"params": state.params_g_a2b},
                               jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-5)
    adam = state.opt_g.inner_state[0]
    # A2B moments non-trivial, untouched B2A moments exactly zero
    assert any(float(jnp.abs(l).max()) > 0
               for l in jax.tree_util.tree_leaves(adam.mu["a2b"]))
    assert all(float(jnp.abs(l).max()) == 0.0
               for l in jax.tree_util.tree_leaves(adam.mu["b2a"]))
    # discriminator optimizers absent from the dict -> fresh template state
    assert int(state.opt_d_a.inner_state[0].count) == 0


def test_import_rejects_generator_only_pth(torch_env, tmp_path):
    """A bare generator .pth is not a training checkpoint — the error
    points at models/torch_import instead of failing obscurely."""
    import torch
    _t, TG, _TD, _losses = torch_env
    path = tmp_path / "G_A2B_last.pth"
    torch.save(TG(1, R_BLOCKS).state_dict(), str(path))
    _cfg, template, _g, _d = _make_template()
    with pytest.raises(KeyError, match="torch_import"):
        import_torch_checkpoint(str(path), template,
                                num_residual_blocks=R_BLOCKS)


def test_resume_continuity_one_step(trained_checkpoint):
    """Step 4 on both frameworks from the imported state: loss_G, loss_D
    and the post-step generator parameters must match (fp32)."""
    import torch
    path, batches, models, opts, losses = trained_checkpoint
    cfg, template, gen, disc = _make_template()
    state = import_torch_checkpoint(path, template,
                                    num_residual_blocks=R_BLOCKS)
    # per-epoch LambdaLR for the resumed epoch (what the loop does)
    lr = lr_for_epoch(cfg.lr, int(state.epoch) + 1, cfg.epochs,
                      cfg.decay_epoch)
    state = state.set_learning_rate(lr)

    step = make_train_step(gen, disc, cfg, LossConfig(), donate=False,
                           remat=False)
    batch_np = batches[3]
    jax_batch = {
        "a": jnp.asarray(batch_np["a"].transpose(0, 2, 3, 1)),
        "b": jnp.asarray(batch_np["b"].transpose(0, 2, 3, 1)),
    }
    new_state, metrics = step(state, jax_batch)

    loss_g_torch, loss_d_torch = _torch_train_step(
        torch, models, opts, losses, batch_np, IMG)

    assert float(metrics["loss_G"]) == pytest.approx(loss_g_torch,
                                                     rel=2e-3)
    assert float(metrics["loss_D"]) == pytest.approx(loss_d_torch,
                                                     rel=2e-3)

    # post-step parameter continuity: compare the updated A2B generator
    # leaf-by-leaf against torch's post-step weights
    want = generator_params_from_torch(models[0].state_dict(), R_BLOCKS)
    flat_got = jax.tree_util.tree_leaves_with_path(new_state.params_g_a2b)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want))
    assert flat_want
    for keypath, leaf in flat_got:
        ref = np.asarray(flat_want[keypath], np.float32)
        got = np.asarray(leaf, np.float32)
        ks = jax.tree_util.keystr(keypath)
        # Conv biases feeding straight into InstanceNorm have an EXACTLY
        # zero gradient (IN cancels per-channel constants): their Adam
        # m-hat/sqrt(v-hat) direction is pure numerical noise, so the two
        # frameworks' updates for them legitimately differ by up to the
        # full +-lr update scale. Every other leaf must track tightly.
        # (Only the head conv's bias escapes an IN; every other bias is
        # degenerate — reference architecture modules/model.py:94-113.)
        degenerate = "'bias'" in ks and "head" not in ks
        atol = (3.0 if degenerate else 0.2) * lr
        # both sides took an identical-state Adam step; differences come
        # only from fp32 cross-backend gradient noise scaled by lr (a
        # near-tie argmax in a CBAM pool can shift single elements by
        # ~0.1x lr). A state-mapping bug would shift EVERY element by
        # O(lr) (wrong moments) or O(1) (wrong weights) — far above this.
        np.testing.assert_allclose(got, ref, rtol=5e-3, atol=atol,
                                   err_msg=ks)
