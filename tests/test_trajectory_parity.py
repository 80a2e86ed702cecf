"""Training-TRAJECTORY parity vs the torch twins (VERDICT r2 item 5).

Single-step gradient parity (test_model_parity.py) cannot see drift in the
optimizer update rule, LR schedule, or BN statistics handling. Two layers of
coverage here against torch.optim.Adam:

1. `test_adam_semantics_match_torch_exactly` — an analytic no-model control
   pinning torch Adam semantics to ~1e-7: L2 decay folded into the gradient
   BEFORE the moments (not AdamW-decoupled), bias correction, eps placement
   (outside the sqrt), and mid-run LR changes via set_learning_rate.

2. `test_training_trajectory_matches_twin` — K=30 steps with a cosine LR
   schedule stepped every iteration and train-mode BN (momentum 0.1),
   asserting the per-step LOSS trajectories stay inside a measured noise
   band. fp32 cross-framework noise (~1e-3 per activation pass) flips
   occasional ReLU/max-pool gates; Adam's normalized updates then amplify
   the rerouted gradients, so the PARAMETER trajectories separate chaotically
   (measured rel-l2 ~0.7 after 30 steps on BOTH of two correct
   implementations) while the LOSS curves stay within a few percent — loss,
   not params, is the meaningful K-step observable. Measured drift: max 2.8%,
   mean <1%, non-growing; a wrong update rule (e.g. missing bias correction)
   shifts early-step losses by >10%.

Reference semantics: torch.optim.Adam + per-epoch scheduler (reference
train.py:96-119, configs/**). Dropout is disabled on both sides.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import torch_twins as tw  # noqa: E402
from test_model_parity import CASES, _import_into  # noqa: E402

K_STEPS = 30
LR = 1e-3
WEIGHT_DECAY = 1e-4
B, N = 8, 64



def _seed(name: str) -> int:
    """Deterministic per-case seed. Python's built-in str hash is SALTED per
    process (PYTHONHASHSEED), which made twin weights differ run-to-run and
    the fp32 flip-fraction bounds flaky at their boundary."""
    import zlib

    return zlib.crc32(name.encode()) % 2**31

def _batches(name, channels, num_classes, k=K_STEPS):
    rng = np.random.RandomState(_seed(name))
    batches = []
    for _ in range(k):
        x = rng.randn(B, channels, N).astype(np.float32)
        x[:, :3] *= 0.35
        y = rng.randint(0, num_classes, size=(B, N))
        batches.append((x, y))
    return batches


def _case(name):
    case = CASES[name]
    if name == "pvcnn_shapenet":
        # one-hot shape id rows are part of the input (models/shapenet/pvcnn.py)
        channels, num_classes = 6 + 4, 10
    else:
        channels, num_classes = 9, 13
    return case, channels, num_classes


def _disable_dropout(twin, monkeypatch):
    import flax.linen as nn

    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, deterministic=None, rng=None: x)
    twin.train()
    for mod in twin.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.eval()


def _torch_train(twin, batches, lr, weight_decay, schedule_tmax=None):
    opt = torch.optim.Adam(twin.parameters(), lr=lr,
                           weight_decay=weight_decay)
    sched = (torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=schedule_tmax)
             if schedule_tmax else None)
    losses = []
    for x, y in batches:
        opt.zero_grad()
        out = twin(torch.from_numpy(x))
        loss = torch.nn.functional.cross_entropy(out, torch.from_numpy(y))
        loss.backward()
        opt.step()
        if sched is not None:
            sched.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses)


def _jax_trainer(case, x0, state0, lr, weight_decay):
    from pvcnn_tpu.nn.loss import CrossEntropyLoss
    from pvcnn_tpu.parallel import mesh as pmesh
    from pvcnn_tpu.train.optim import Adam
    from pvcnn_tpu.train.trainer import Trainer

    model = case["flax"]()
    variables = _import_into(model, x0, state0, case["mapping"]())
    tx, _ = Adam(lr, weight_decay=weight_decay)
    trainer = Trainer(model, CrossEntropyLoss(), tx)
    state = trainer.init_state(x0[:1])
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    state = jax.device_put(state, pmesh.replicated(trainer.mesh))
    return trainer, state


def _jax_train(trainer, state, batches, schedule=None):
    from pvcnn_tpu.parallel import mesh as pmesh
    from pvcnn_tpu.train.optim import set_learning_rate

    key = jax.random.PRNGKey(0)
    losses = []
    for k, (x, y) in enumerate(batches):
        if schedule is not None:
            set_learning_rate(state.opt_state, schedule(k))
        batch = pmesh.shard_batch(
            (x.transpose(0, 2, 1), y.astype(np.int32)), trainer.mesh)
        state, loss = trainer._train_step(state, batch, key)
        losses.append(float(loss))
    return state, np.asarray(losses)


def _param_rel_l2(state, twin, case):
    """Global rel-l2 between our params and the twin's (mapped through the
    linear import shim so trees align)."""
    import flax

    from pvcnn_tpu.utils import checkpoint_import as ci

    final_t = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    want_tree, _ = ci.import_state_dict(
        final_t, jax.tree.map(np.asarray, flax.core.unfreeze(state.params)),
        jax.tree.map(np.asarray, flax.core.unfreeze(state.batch_stats)),
        case["mapping"]())
    got = np.concatenate([np.ravel(np.asarray(g, np.float64))
                          for g in jax.tree.leaves(state.params)])
    want = np.concatenate([np.ravel(np.asarray(g, np.float64))
                           for g in jax.tree.leaves(want_tree)])
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)


def test_adam_semantics_match_torch_exactly():
    """Analytic control (no model, no noise): our optax chain must reproduce
    torch.optim.Adam bit-tight over several steps — L2 decay folded into the
    gradient BEFORE the moments (not AdamW-decoupled), bias correction, eps
    added OUTSIDE the sqrt — including a mid-run LR change (the per-epoch
    scheduler path, train/optim.py set_learning_rate). A single-step
    comparison through the full model cannot do this job: Adam's first step
    is lr*sign(g), and fp32 cross-framework gradient noise flips the sign
    wherever |g| is tiny (measured 13% param rel-l2 after ONE model step on
    two correct implementations)."""
    import optax

    from pvcnn_tpu.train.optim import Adam, set_learning_rate

    rng = np.random.RandomState(0)
    p0 = rng.randn(64).astype(np.float32)
    grads = [rng.randn(64).astype(np.float32) for _ in range(6)]
    lr, wd = 1e-2, 3e-2
    lrs = [lr, lr, 5e-3, 5e-3, 2e-3, 2e-3]

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([pt], lr=lr, weight_decay=wd)
    torch_traj = []
    for g, cur_lr in zip(grads, lrs):
        for group in opt.param_groups:
            group["lr"] = cur_lr
        opt.zero_grad()
        pt.grad = torch.from_numpy(g.copy())
        opt.step()
        torch_traj.append(pt.detach().numpy().copy())

    tx, _ = Adam(lr, weight_decay=wd)
    params = jnp.asarray(p0)
    opt_state = tx.init(params)
    for k, (g, cur_lr) in enumerate(zip(grads, lrs)):
        set_learning_rate(opt_state, cur_lr)
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params), torch_traj[k],
                                   rtol=1e-5, atol=5e-7,
                                   err_msg=f"step {k}")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["pvcnn_shapenet", "pvcnn2_s3dis"])
def test_training_trajectory_matches_twin(name, monkeypatch):
    from pvcnn_tpu.train.optim import CosineAnnealingLR

    case, channels, num_classes = _case(name)
    batches = _batches(name, channels, num_classes)

    twin = tw.randomize(case["twin"](), seed=_seed(name))
    _disable_dropout(twin, monkeypatch)
    # deep-copy: state_dict_numpy returns VIEWS and torch optim updates
    # parameters in place, so without .copy() the jax run would start from
    # the post-training torch weights
    state0 = {k: v.copy() for k, v in tw.state_dict_numpy(twin).items()}
    losses_t = _torch_train(twin, batches, LR, WEIGHT_DECAY,
                            schedule_tmax=K_STEPS)

    x0 = jnp.asarray(batches[0][0].transpose(0, 2, 1))
    trainer, state = _jax_trainer(case, x0, state0, LR, WEIGHT_DECAY)
    schedule = CosineAnnealingLR(t_max=K_STEPS, base_lr=LR)
    state, losses_j = _jax_train(trainer, state, batches, schedule)

    rel = np.abs(losses_j - losses_t) / np.maximum(np.abs(losses_t), 1e-6)
    # measured on two correct implementations: max 2.8%, mean <1%, spikes
    # uncorrelated with k (pure gate-flip noise, no compounding bias)
    assert rel[0] < 2e-2, rel[0]
    assert rel.max() < 5e-2, (rel.argmax(), rel.max())
    assert rel.mean() < 2e-2, rel.mean()
