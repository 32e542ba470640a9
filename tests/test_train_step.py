"""Single-train-step correctness + multi-device data-parallel tests
(SURVEY.md §7 build stages 5-6). Runs on the 8-virtual-CPU-device backend
set up in conftest."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ducosy_tpu.config import (
    LossConfig,
    ModelConfig,
    SOFT_TISSUE,
    TrainConfig,
    replace,
)
from ducosy_tpu.parallel import data_mesh, replicate, shard_batch
from ducosy_tpu.train import create_state, make_train_step, make_val_step
from ducosy_tpu.train.schedule import lr_for_epoch

pytestmark = pytest.mark.slow  # full-tier only: heavy compiles /
# torch parity (round-5 fast tier: pytest -m "not slow")


IMG = 32
CFG = replace(TrainConfig(), img_size=IMG, batch_size=8,
              compute_dtype="float32")  # deterministic CPU math
MODEL = ModelConfig(num_residual_blocks=2)
RANGE = SOFT_TISSUE  # 2 masks -> 3 input channels


def _batch(rng, n=8):
    return {
        "a": jnp.asarray(rng.uniform(-1, 1, (n, IMG, IMG, 1)), jnp.float32),
        "b": jnp.asarray(rng.uniform(-1, 1, (n, IMG, IMG, 1)), jnp.float32),
        "masks": jnp.asarray(rng.integers(0, 2, (n, IMG, IMG, 2)), jnp.float32),
    }


@pytest.fixture(scope="module")
def setup():
    state, gen, disc = create_state(jax.random.PRNGKey(0), CFG, RANGE, MODEL,
                                    img_size=IMG)
    return state, gen, disc


def test_train_step_updates_all_networks(setup, rng):
    state, gen, disc = setup
    step = make_train_step(gen, disc, CFG, donate=False)
    batch = _batch(rng)
    new_state, metrics = step(state, batch)

    for name in ("params_g_a2b", "params_g_b2a", "params_d_a", "params_d_b"):
        before = jax.tree_util.tree_leaves(getattr(state, name))
        after = jax.tree_util.tree_leaves(getattr(new_state, name))
        changed = any(
            not np.allclose(np.asarray(b), np.asarray(a))
            for b, a in zip(before, after))
        assert changed, f"{name} did not update"

    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics["loss_G"]) > 0


def test_train_step_deterministic(setup, rng):
    state, gen, disc = setup
    step = make_train_step(gen, disc, CFG, donate=False)
    batch = _batch(rng)
    _, m1 = step(state, batch)
    _, m2 = step(state, batch)
    np.testing.assert_allclose(float(m1["loss_G"]), float(m2["loss_G"]),
                               rtol=1e-6)


def test_val_step(setup, rng):
    state, gen, disc = setup
    vstep = make_val_step(gen, disc, CFG)
    loss, fake_b = vstep(state, _batch(rng))
    assert np.isfinite(float(loss))
    assert fake_b.shape == (8, IMG, IMG, 1)


def test_lr_schedule_matches_lambdalr():
    # constant before decay_epoch, linear to 0 at the end (trainer.py:364)
    assert lr_for_epoch(2e-4, 0, 200, 100) == 2e-4
    assert lr_for_epoch(2e-4, 98, 200, 100) == 2e-4
    np.testing.assert_allclose(lr_for_epoch(2e-4, 100, 200, 100),
                               2e-4 * (1 - 1 / 100))
    np.testing.assert_allclose(lr_for_epoch(2e-4, 199, 200, 100), 0.0,
                               atol=1e-12)


def test_set_learning_rate(setup):
    state, _, _ = setup
    new = state.set_learning_rate(1e-5)
    import optax
    assert float(optax.tree_utils.tree_get(new.opt_g, "learning_rate")) == \
        pytest.approx(1e-5)


def test_data_parallel_step_matches_single_device(setup, rng):
    """The sharded step must produce the same losses and parameter updates as
    the single-device step — data parallelism is a pure performance
    transform."""
    state, gen, disc = setup
    batch = _batch(rng)

    step = make_train_step(gen, disc, CFG, donate=False)
    ref_state, ref_metrics = step(state, batch)

    mesh = data_mesh()  # 8 virtual devices from conftest
    assert mesh.devices.size == 8
    sharded_state = replicate(mesh, state)
    sharded_batch = shard_batch(mesh, batch)
    dp_state, dp_metrics = step(sharded_state, sharded_batch)

    np.testing.assert_allclose(float(dp_metrics["loss_G"]),
                               float(ref_metrics["loss_G"]), rtol=2e-4)
    np.testing.assert_allclose(float(dp_metrics["loss_D"]),
                               float(ref_metrics["loss_D"]), rtol=2e-4)
    # spot-check a parameter tensor for matching updates. Adam divides by
    # sqrt(v); for near-zero gradients the cross-device reduction order can
    # flip an update's direction, so allow deviations up to ~2*lr on a tiny
    # fraction of elements while requiring bit-level agreement elsewhere.
    ref_leaf = np.asarray(
        jax.tree_util.tree_leaves(ref_state.params_g_a2b)[0])
    dp_leaf = np.asarray(
        jax.tree_util.tree_leaves(dp_state.params_g_a2b)[0])
    diff = np.abs(dp_leaf - ref_leaf)
    assert diff.max() < 2 * CFG.lr * 2
    assert np.mean(diff < 1e-5) > 0.99


def test_padded_batch_matches_ragged_gradients(setup, rng):
    """A wrap-padded batch with a "weight" vector must produce EXACTLY the
    loss values and gradients of the corresponding ragged batch (the
    reference's partial final DataLoader batch) — padded duplicates
    contribute nothing. Gradients are compared directly because Adam
    amplifies float-eps noise on near-zero gradients into lr-scale
    parameter deltas."""
    from ducosy_tpu.losses.suite import discriminator_loss, generator_loss

    state, gen, disc = setup
    n_real, n_pad = 5, 8
    ragged = _batch(rng, n=n_real)
    padded = {k: jnp.concatenate(
        [v, v[: n_pad - n_real]], axis=0) for k, v in ragged.items()}
    w = np.zeros(n_pad, np.float32)
    w[:n_real] = 1.0
    weight = jnp.asarray(w)

    def g_loss(g_params, batch, sample_weight, n_r):
        ga = lambda p, x: gen.apply({"params": p}, x)
        da = lambda p, x: disc.apply({"params": p}, x)
        inp_a = jnp.concatenate([batch["a"], batch["masks"]], -1)
        inp_b = jnp.concatenate([batch["b"], batch["masks"]], -1)
        fake_b = ga(g_params["a2b"], inp_a)
        fake_a = ga(g_params["b2a"], inp_b)
        id_a = ga(g_params["b2a"], inp_a)
        id_b = ga(g_params["a2b"], inp_b)
        rec_a = ga(g_params["b2a"],
                   jnp.concatenate([fake_b, batch["masks"]], -1))
        rec_b = ga(g_params["a2b"],
                   jnp.concatenate([fake_a, batch["masks"]], -1))
        terms = generator_loss(
            real_a=batch["a"], real_b=batch["b"], fake_a=fake_a,
            fake_b=fake_b, rec_a=rec_a, rec_b=rec_b, id_a=id_a, id_b=id_b,
            d_a_fake_logits=da(state.params_d_a, fake_a),
            d_b_fake_logits=da(state.params_d_b, fake_b),
            cfg=CFG, sample_weight=sample_weight, n_real=n_r)
        return terms.total

    g_params = {"a2b": state.params_g_a2b, "b2a": state.params_g_b2a}
    loss_r, grads_r = jax.value_and_grad(g_loss)(g_params, ragged, None, None)
    loss_p, grads_p = jax.value_and_grad(g_loss)(g_params, padded, weight,
                                                 n_real)
    np.testing.assert_allclose(float(loss_p), float(loss_r), rtol=1e-5)
    for lr_, lp_ in zip(jax.tree_util.tree_leaves(grads_r),
                        jax.tree_util.tree_leaves(grads_p)):
        np.testing.assert_allclose(np.asarray(lp_), np.asarray(lr_),
                                   rtol=1e-4, atol=2e-6)

    def d_loss(d_params, batch, fake, sample_weight):
        da = lambda p, x: disc.apply({"params": p}, x)
        return discriminator_loss(da(d_params, batch),
                                  da(d_params, fake), sample_weight)

    fake_r = jnp.asarray(rng.uniform(-1, 1, (n_real, IMG, IMG, 1)),
                         jnp.float32)
    fake_p = jnp.concatenate([fake_r, fake_r[: n_pad - n_real]], axis=0)
    dl_r, dg_r = jax.value_and_grad(d_loss)(state.params_d_a, ragged["a"],
                                            fake_r, None)
    dl_p, dg_p = jax.value_and_grad(d_loss)(state.params_d_a, padded["a"],
                                            fake_p, weight)
    np.testing.assert_allclose(float(dl_p), float(dl_r), rtol=1e-5)
    for lr_, lp_ in zip(jax.tree_util.tree_leaves(dg_r),
                        jax.tree_util.tree_leaves(dg_p)):
        np.testing.assert_allclose(np.asarray(lp_), np.asarray(lr_),
                                   rtol=1e-4, atol=2e-6)


def test_loader_emits_weight_on_final_batch():
    from ducosy_tpu.data.loader import HostLoader

    class Toy:
        def __len__(self):
            return 10  # 10 % 4 = 2 -> final batch has 2 real + 2 padded

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32)}

    loader = HostLoader(Toy(), 4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert "weight" not in batches[0] and "weight" not in batches[1]
    np.testing.assert_array_equal(batches[2]["weight"],
                                  [1.0, 1.0, 0.0, 0.0])
    assert batches[2]["x"].shape == (4, 3)


def test_packed_train_step_matches_module(setup, rng):
    """make_train_step(gen_forward="packed") must produce the same losses
    as the canonical module forward (fp32, tiny shapes)."""
    state, gen, disc = setup
    batch = _batch(rng)
    step_m = make_train_step(gen, disc, CFG, donate=False,
                             gen_forward="module")
    step_p = make_train_step(gen, disc, CFG, donate=False,
                             gen_forward="packed")
    _, m_mod = step_m(state, batch)
    _, m_pk = step_p(state, batch)
    for k in m_mod:
        np.testing.assert_allclose(float(m_pk[k]), float(m_mod[k]),
                                   rtol=5e-5, err_msg=k)


def test_batched_forwards_step_matches_unbatched(setup, rng):
    """batched_forwards=True (6 generator forwards folded into 4, paired
    2N-batch discriminator forwards) is the same math — IN statistics and
    CBAM gates are per-sample — so every loss must match the unbatched
    step (fp32, tiny shapes)."""
    state, gen, disc = setup
    batch = _batch(rng)
    step_u = make_train_step(gen, disc, CFG, donate=False)
    step_b = make_train_step(gen, disc, CFG, donate=False,
                             batched_forwards=True)
    su, m_u = step_u(state, batch)
    sb, m_b = step_b(state, batch)
    for k in m_u:
        np.testing.assert_allclose(float(m_b[k]), float(m_u[k]),
                                   rtol=5e-6, err_msg=k)
    # parameter updates match too (same gradients through the fold). Adam
    # rescales each element by 1/sqrt(v), so a near-zero gradient element
    # can flip sign under the 2N-batch reduction order and move a full
    # lr=2e-4 the other way — tolerance is the one-step update scale; a
    # structural error would shift whole tensors (and the losses above).
    for name in ("params_g_a2b", "params_d_a"):
        for u, b in zip(jax.tree_util.tree_leaves(getattr(su, name)),
                        jax.tree_util.tree_leaves(getattr(sb, name))):
            np.testing.assert_allclose(np.asarray(b), np.asarray(u),
                                       atol=2.5 * CFG.lr)


def test_spatial_parallel_step_matches_single_device(setup, rng):
    """Training on a (data, sp) mesh — batch rows over 'data', image rows
    over 'sp' (shard_batch shards H automatically on such a mesh) — is the
    same math: XLA partitions the convs with halo exchanges and turns the
    full-image loss reductions into partials + all-reduce."""
    from ducosy_tpu.parallel import data_sp_mesh

    state, gen, disc = setup
    batch = _batch(rng)
    step = make_train_step(gen, disc, CFG, donate=False)
    ref_state, ref_metrics = step(state, batch)

    mesh = data_sp_mesh(2, 4)
    sp_state = replicate(mesh, state)
    sp_batch = shard_batch(mesh, batch)
    assert "sp" in str(sp_batch["a"].sharding.spec)
    sp_state, sp_metrics = step(sp_state, sp_batch)

    for k in ("loss_G", "loss_D", "loss_ssim", "contrast"):
        np.testing.assert_allclose(float(sp_metrics[k]),
                                   float(ref_metrics[k]), rtol=2e-4,
                                   err_msg=k)
    ref_leaf = np.asarray(
        jax.tree_util.tree_leaves(ref_state.params_g_a2b)[0])
    sp_leaf = np.asarray(
        jax.tree_util.tree_leaves(sp_state.params_g_a2b)[0])
    diff = np.abs(sp_leaf - ref_leaf)
    assert diff.max() < 2 * CFG.lr * 2
    assert np.mean(diff < 1e-5) > 0.99
