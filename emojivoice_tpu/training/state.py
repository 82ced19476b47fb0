"""Train state + compiled train/eval steps.

Replaces the reference's Lightning module/trainer pair
(reference: matcha/models/baselightningmodule.py:30-175, train.py:35-90):
optax Adam (lr 1e-4) with global-norm clipping 5.0
(configs/model/optimizer/adam.yaml + trainer.default gradient_clip_val),
loss = dur + prior + diff (baselightningmodule.get_losses:56-74), grad-norm
metric every step (:218-219).

Data parallelism: the returned train_step is jit-compiled with the batch
sharded over the mesh's data axis and params replicated — XLA inserts the
gradient all-reduce over ICI (the DDP/NCCL equivalent, SURVEY.md §2.8).

Tensor parallelism: pass a 2-D ``(data, model)`` mesh (parallel/tp.py
``make_mesh_2d``) and params + optimizer state are sharded per TP_RULES
(Megatron column→row pairs); GSPMD inserts the intra-layer collectives.
The reference has no TP at all — this is TPU-native headroom.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from emojivoice_tpu.config import ModelConfig, OptimizerConfig
from emojivoice_tpu.models import MatchaTTS
from emojivoice_tpu.utils.trees import cast_floats as _cast_floats
from emojivoice_tpu.parallel.mesh import batch_sharding, replicated_sharding
from jax.sharding import NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_schedule(cfg: OptimizerConfig):
    """Step-count LR schedule from the config; a float for constant lr.

    Reference analog: the optional torch scheduler in
    baselightningmodule.configure_optimizers:30-54.  optax schedules are
    driven by the restored optimizer step count, so resume lands at the
    right position without the reference's last_epoch bookkeeping.
    """
    name = (cfg.scheduler or "constant").lower()
    if name == "constant":
        main = optax.constant_schedule(cfg.lr) if cfg.warmup_steps else cfg.lr
    elif name == "exponential":
        main = optax.exponential_decay(cfg.lr, transition_steps=cfg.decay_steps,
                                       decay_rate=cfg.scheduler_gamma)
    elif name == "cosine":
        alpha = cfg.lr_end / cfg.lr if cfg.lr else 0.0
        main = optax.cosine_decay_schedule(cfg.lr, cfg.decay_steps, alpha=alpha)
    else:
        raise ValueError(f"Unknown scheduler: {cfg.scheduler!r}")
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        return optax.join_schedules([warmup, main], [cfg.warmup_steps])
    return main


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    lr = make_schedule(cfg)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(lr, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay)
        if cfg.weight_decay
        else optax.adam(lr, b1=cfg.b1, b2=cfg.b2),
    )


def create_train_state(model_cfg: ModelConfig, opt_cfg: OptimizerConfig, seed: int = 1234,
                       params: Optional[Any] = None) -> TrainState:
    model = MatchaTTS(cfg=model_cfg)
    if params is None:
        rng = jax.random.PRNGKey(seed)
        x = jnp.ones((1, 8), jnp.int32)
        y = jnp.zeros((1, 16, model_cfg.n_feats))
        spks = jnp.array([0]) if model_cfg.n_spks > 1 else None
        # jit the init: eager flax init dispatches every initializer as its
        # own device op — hundreds of synchronous round trips over a remote
        # TPU tunnel; one compiled program instead
        params = jax.jit(model.init)({"params": rng, "dropout": rng}, x, jnp.array([8]), y,
                                     jnp.array([16]), spks, rng=rng)
    tx = make_optimizer(opt_cfg)
    return TrainState(params=params, opt_state=tx.init(params["params"]), step=jnp.asarray(0))


def _dtype_for(precision: str):
    if precision in ("bf16-mixed", "bf16", "16-mixed"):
        return jnp.bfloat16
    if precision in ("f32", "fp32", "32", "32-true", None):
        return jnp.float32
    raise ValueError(f"Unknown precision: {precision!r}")




def _losses(model: MatchaTTS, params, batch, rng, out_size, deterministic):
    """Training/eval losses.  When the variables carry a ``batch_stats``
    collection (conformer-block BatchNorm running statistics) and this is a
    training forward, the collection is threaded mutably and the updated
    stats are returned as the 4th element (empty dict otherwise)."""
    args = (batch["x"], batch["x_lengths"], batch["y"], batch["y_lengths"], batch.get("spks"))
    kwargs = dict(
        durations=batch.get("durations"),
        out_size=out_size,
        rng=rng,
        deterministic=deterministic,
        row_mask=batch.get("row_mask"),
        rngs=None if deterministic else {"dropout": jax.random.fold_in(rng, 1)},
    )
    if not deterministic and "batch_stats" in params:
        (dur, prior, diff, _), updated = model.apply(
            params, *args, mutable=["batch_stats"], **kwargs)
        return dur, prior, diff, updated
    dur, prior, diff, _ = model.apply(params, *args, **kwargs)
    return dur, prior, diff, {}


def _build_step_fn(model_cfg: ModelConfig, opt_cfg: OptimizerConfig, precision: str):
    """The un-jitted single optimizer step (state, batch, rng) → (state,
    metrics) — shared by make_train_step (one dispatch per step) and
    make_train_multi_step (K steps per dispatch via lax.scan)."""
    model = MatchaTTS(cfg=model_cfg)
    tx = make_optimizer(opt_cfg)
    sched = make_schedule(opt_cfg)
    out_size = model_cfg.out_size
    compute_dtype = _dtype_for(precision)

    def step_fn(state: TrainState, batch, rng):
        # wire-format upcast: the train CLI's --wire_f16 ships mels as f16
        # (halves the dominant host→device transfer; on tunneled TPUs the
        # step is transfer-bound); compute stays f32 from here on. A no-op
        # for f32 inputs.
        if batch["y"].dtype != jnp.float32:
            batch = {**batch, "y": batch["y"].astype(jnp.float32)}
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            if compute_dtype != jnp.float32:
                params = _cast_floats(params, compute_dtype)
                batch_c = _cast_floats(batch, compute_dtype)
            else:
                batch_c = batch
            dur, prior, diff, stats_upd = _losses(
                model, params, batch_c, rng, out_size, deterministic=False)
            # loss terms are f32 by construction (models cast reductions up)
            total = dur + prior + diff
            return total, (dur, prior, diff, stats_upd)

        (total, (dur, prior, diff, stats_upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        g = grads["params"]
        grad_norm = optax.global_norm(g)
        updates, opt_state = tx.update(g, state.opt_state, state.params["params"])
        params = {k: v for k, v in state.params.items()}
        params["params"] = optax.apply_updates(state.params["params"], updates)
        if stats_upd:  # conformer BatchNorm running stats, kept f32 at rest
            params.update(_cast_floats(stats_upd, jnp.float32))
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {
            "loss": total,
            "dur_loss": dur,
            "prior_loss": prior,
            "diff_loss": diff,
            "grad_norm": grad_norm,
            "lr": sched(state.step) if callable(sched) else jnp.asarray(sched),
        }
        return new_state, metrics

    return step_fn


def make_train_step(model_cfg: ModelConfig, opt_cfg: OptimizerConfig, mesh=None, axis: str = "data",
                    precision: str = "f32"):
    """Build the jitted data-parallel train step:
    (state, batch, rng) → (state, metrics).

    batch: {"x": (B,Tx) i32, "x_lengths": (B,), "y": (B,Ty,n_feats),
            "y_lengths": (B,), "spks": (B,) [multi-speaker],
            "durations": (B,Tx) [optional]}.

    precision "bf16-mixed" (the reference trainer's `precision: 16-mixed`,
    configs/trainer/default.yaml) runs the forward/backward compute in
    bfloat16 while parameters, loss reductions, gradients and optimizer
    state stay f32 — TPU bf16 needs no loss scaling.
    """
    step_fn = _build_step_fn(model_cfg, opt_cfg, precision)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis)
    state_sh = train_state_shardings(model_cfg, opt_cfg, mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_train_multi_step(model_cfg: ModelConfig, opt_cfg: OptimizerConfig, mesh=None,
                          axis: str = "data", precision: str = "f32"):
    """K optimizer steps in ONE compiled program:
    (state, batches, rng, step_mask) → (state, metrics).

    batches: the single-step batch dict with every leaf stacked to
    (K, B, ...); step_mask: (K,) f32 — 1 for a real step, 0 for chunk
    padding (the state passes through such a sub-step unchanged, so the
    caller can pad a partial chunk to the compiled K by repeating a batch).
    metrics come back stacked (K,) per key; the caller filters by mask.

    Why: each dispatch to a remote TPU pays a host↔device round trip (~30 ms
    through this environment's tunnel — tools/bench_train.py), which at
    ~8 ms device compute per step is the training-throughput ceiling no
    matter how pipelined the host loop is.  Scanning K steps device-side
    amortizes that round trip over K optimizer steps; the batch chunk rides
    the one dispatch.  Numerics are EXACTLY the single-step loop's: the
    per-step PRNG is fold_in(rng, state.step) inside the shared step_fn, so
    the same base rng produces the same per-step streams either way
    (pinned in tests/test_training.py).  The reference has no analog — its
    Lightning loop is one optimizer step per Python iteration.
    """
    step_fn = _build_step_fn(model_cfg, opt_cfg, precision)

    def multi_fn(state: TrainState, batches, rng, step_mask):
        def body(st, xs):
            b, mask = xs
            new_st, m = step_fn(st, b, rng)
            # masked sub-step: pass the ENTIRE state through unchanged
            # (an optimizer step with zero grads is NOT a no-op — Adam
            # moments decay — so masking after the fact is the only exact
            # form). jnp.where keeps it one fused select per leaf.
            st = jax.tree.map(lambda n, o: jnp.where(mask > 0, n, o), new_st, st)
            return st, m

        # unroll=True: the rolled scan double-buffers the ~190 MB
        # params+adam carry every iteration — measured ~24 ms/step against
        # 4.6 ms/step for the identical math as straight-line code on a
        # v5e (the carry copies cost 5×).  K is small (≤ steps_per_dispatch,
        # typically ≤ 8), so full unrolling is cheap to compile and lets
        # XLA treat the carry as pure dataflow, no per-iteration copies.
        return jax.lax.scan(body, state, (batches, step_mask), unroll=True)

    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=(0,))

    repl = replicated_sharding(mesh)
    chunk = NamedSharding(mesh, P(None, axis))  # (K, B, ...): shard the batch dim
    state_sh = train_state_shardings(model_cfg, opt_cfg, mesh)
    return jax.jit(
        multi_fn,
        in_shardings=(state_sh, chunk, repl, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def abstract_train_state(model_cfg: ModelConfig, opt_cfg: OptimizerConfig, mesh=None):
    """ShapeDtypeStruct TrainState template (no buffers allocated).

    With a mesh, every leaf carries its NamedSharding — handing this to
    orbax's StandardRestore makes the checkpoint load land each shard on
    its device directly (no full-size host copy, no post-hoc device_put),
    which is how a TP-sharded training run resumes.
    """
    shapes = jax.eval_shape(lambda: create_train_state(model_cfg, opt_cfg))
    if mesh is None:
        return shapes
    sh = train_state_shardings(model_cfg, opt_cfg, mesh)
    if isinstance(sh, jax.sharding.Sharding):  # 1-D mesh → one replicated sharding
        return jax.tree.map(lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sh), shapes)
    return jax.tree.map(lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s), shapes, sh)


def train_state_shardings(model_cfg: ModelConfig, opt_cfg: OptimizerConfig, mesh):
    """Sharding pytree for the full TrainState on `mesh`.

    1-D (data-only) mesh → everything replicated (round-1 DDP-analog
    behavior).  2-D (data, model) mesh → params and the mirrored adam mu/nu
    subtrees shard per parallel/tp.py TP_RULES; scalars stay replicated.
    Computed from ``jax.eval_shape`` so no real buffers are allocated.
    """
    from emojivoice_tpu.parallel.tp import MODEL_AXIS, tp_shardings

    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return replicated_sharding(mesh)
    shapes = jax.eval_shape(lambda: create_train_state(model_cfg, opt_cfg))
    return tp_shardings(shapes, mesh)


def make_eval_step(model_cfg: ModelConfig, mesh=None, axis: str = "data", precision: str = "f32"):
    """Validation losses (no dropout, fixed noise key per step)."""
    model = MatchaTTS(cfg=model_cfg)
    compute_dtype = _dtype_for(precision)

    def eval_fn(params, batch, rng):
        if batch["y"].dtype != jnp.float32:  # --wire_f16 transfers (see step_fn)
            batch = {**batch, "y": batch["y"].astype(jnp.float32)}
        if compute_dtype != jnp.float32:
            params = _cast_floats(params, compute_dtype)
            batch = _cast_floats(batch, compute_dtype)
        dur, prior, diff, _ = _losses(model, params, batch, rng, None, deterministic=True)
        return {"dur_loss": dur, "prior_loss": prior, "diff_loss": diff, "loss": dur + prior + diff}

    if mesh is None:
        return jax.jit(eval_fn)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis)
    from emojivoice_tpu.parallel.tp import MODEL_AXIS, tp_shardings

    if mesh.shape.get(MODEL_AXIS, 1) > 1:
        params_sh = tp_shardings(
            jax.eval_shape(lambda: create_train_state(model_cfg, OptimizerConfig()).params), mesh
        )
    else:
        params_sh = repl
    return jax.jit(eval_fn, in_shardings=(params_sh, data, repl), out_shardings=repl)
