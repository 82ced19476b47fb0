"""`emojivoice-train` — training / fine-tuning loop.

Replaces the reference's Hydra+Lightning entry
(reference: Matcha-TTS/matcha/train.py:35-118): presets instead of the YAML
tree, orbax instead of ModelCheckpoint, a jitted data-parallel step instead
of Trainer+DDP.  Fine-tuning from a released PyTorch checkpoint =
``--from_torch_ckpt`` (the reference's ``ckpt_path=...`` story,
/README.md:145-162: record ~2 min per emoji at 22.05 kHz, build a filelist,
fine-tune the multi-speaker model).
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime as dt
import json
import os
import sys
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="emojivoice-train")
    p.add_argument("--preset", default="ljspeech", help="ljspeech | vctk | emoji_multi")
    p.add_argument("--train_filelist", required=True)
    p.add_argument("--valid_filelist", required=True)
    p.add_argument("--test_filelist", default=None,
                   help="held-out split for a post-fit evaluation pass "
                        "(the reference's trainer.test, train.py:83-90)")
    p.add_argument("--out_dir", default="logs/run")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--max_epochs", type=int, default=-1)
    p.add_argument("--lr", type=float, default=1e-4)
    # LR schedule (reference capability: baselightningmodule.py:30-54)
    p.add_argument("--scheduler", default=None, choices=[None, "constant", "exponential", "cosine"],
                   help="optax LR schedule keyed on optimizer step (resume-correct)")
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--decay_steps", type=int, default=100_000)
    p.add_argument("--scheduler_gamma", type=float, default=0.1)
    p.add_argument("--lr_end", type=float, default=0.0)
    p.add_argument("--precision", default=None, choices=[None, "f32", "bf16-mixed"],
                   help="bf16-mixed = reference 16-mixed analog (bf16 compute, f32 "
                        "params/losses/optimizer); f32 measured faster at this model size; "
                        "default comes from the preset's trainer.precision")
    p.add_argument("--out_size", type=int, default=None, help="Grad-TTS segment crop (multiple of 4)")
    p.add_argument("--from_torch_ckpt", default=None, help="fine-tune from a reference .ckpt")
    p.add_argument("--resume", action="store_true", help="resume from latest orbax ckpt in out_dir")
    p.add_argument("--num_devices", type=int, default=0, help="0 = all visible")
    p.add_argument("--tp", type=int, default=1,
                   help="model-axis degree of a 2-D (data, model) mesh; params + adam "
                        "state shard per parallel/tp.py rules (1 = pure data parallel)")
    # multi-host (DCN) data parallelism — run the same command on every host
    # with its own --dcn_process_id (reference analog: trainer ddp over
    # multiple nodes; ddp_sim = the CPU multi-process variant)
    p.add_argument("--dcn_coordinator", default=None,
                   help="host:port of process 0; enables jax.distributed multi-process training")
    p.add_argument("--dcn_num_processes", type=int, default=1)
    p.add_argument("--dcn_process_id", type=int, default=0)
    p.add_argument("--ckpt_every_steps", type=int, default=1000)
    p.add_argument("--val_every_steps", type=int, default=500)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--mel_stats", default=None, help='JSON {"mel_mean": m, "mel_std": s} override')
    p.add_argument("--render_val_samples", type=int, default=2,
                   help="synthesize N validation texts after each val pass and log mel images "
                        "(the reference's on_validation_end, baselightningmodule.py:177-216); 0 disables")
    # debug-trainer analogs (reference: configs/debug/{fdr,overfit,limit,default}.yaml)
    p.add_argument("--fast_dev_run", action="store_true",
                   help="1 train step + 1 val pass, no checkpoints (debug/fdr.yaml)")
    p.add_argument("--overfit_batches", type=int, default=0,
                   help="train repeatedly on the first N batches (debug/overfit.yaml)")
    p.add_argument("--limit_train_batches", type=int, default=0,
                   help="cap batches per epoch (debug/limit.yaml)")
    p.add_argument("--detect_anomaly", action="store_true",
                   help="fail fast on NaN/Inf (debug/default.yaml detect_anomaly)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="K>1 scans K optimizer steps inside ONE compiled "
                        "program (training.state.make_train_multi_step), "
                        "amortizing the per-dispatch host-device round trip "
                        "— the throughput lever on remote/tunneled TPUs. "
                        "Numerics match K=1 exactly (per-step rng is "
                        "fold_in(step)); val/ckpt cadences fire at the "
                        "first chunk boundary past their step")
    p.add_argument("--wire_f16", action="store_true",
                   help="ship mels to the device as float16 (upcast to f32 "
                        "in-graph before any compute) — halves the dominant "
                        "host-to-device transfer; the step is transfer-bound "
                        "on remote/tunneled TPUs. Quantization noise ~2e-3 "
                        "on log-mels, far below the mel parity budget")
    p.add_argument("--loggers", default="tensorboard",
                   help="comma list of metric backends: tensorboard | csv | "
                        "wandb (the reference's configs/logger/*.yaml choice; "
                        "wandb is gated on the package and skipped with a "
                        "warning when absent). jsonl is always written")
    p.add_argument("--probe_every", type=int, default=0,
                   help="every N steps run MatchaTTS.training_probe on a "
                        "fixed train batch and log alignment-emergence "
                        "diagnostics (diagonality, MAS-duration drift, "
                        "dur MSE, teacher-forced mel L1) under tag 'probe'. "
                        "The measurable form of the reference's eyeballed "
                        "TensorBoard alignment images "
                        "(baselightningmodule.py:177-216); 0 disables")
    p.add_argument("--cache_data", action="store_true",
                   help="keep decoded items (text ids + mels) in memory after "
                        "epoch 1 — right for fine-tune-scale sets on this "
                        "1-core host, wrong for LJSpeech-scale corpora")
    return p


def main(argv=None) -> int:
    """task_wrapper-style entry (reference: utils/utils.py:52-104): run the
    loop; on ANY failure write the traceback to out_dir/exception.log, make
    sure loggers are closed, and re-raise."""
    args = build_parser().parse_args(argv)
    try:
        return _run(args)
    except Exception:
        import traceback

        out = Path(args.out_dir)
        out.mkdir(parents=True, exist_ok=True)
        (out / "exception.log").write_text(traceback.format_exc())
        print(f"[train] FAILED — traceback written to {out / 'exception.log'}",
              file=sys.stderr, flush=True)
        raise


def _run(args) -> int:
    import jax
    import jax.numpy as jnp

    from emojivoice_tpu import config as cfglib
    from emojivoice_tpu.data.dataset import BucketBatcher, Prefetcher, TextMelDataset
    from emojivoice_tpu.io.checkpoint import CheckpointManager
    from emojivoice_tpu.parallel.mesh import (
        initialize_distributed,
        make_mesh,
        pad_batch_to_multiple,
        shard_batch,
        shard_chunk,
    )
    from emojivoice_tpu.training.state import (
        TrainState,
        create_train_state,
        make_eval_step,
        make_train_multi_step,
        make_train_step,
    )

    if args.dcn_coordinator:
        # before ANY device query (jax.distributed must come up first)
        initialize_distributed(args.dcn_coordinator, args.dcn_num_processes, args.dcn_process_id)
        if args.tp > 1:
            raise SystemExit("--tp with --dcn_* is not supported (sharded checkpoint "
                             "save across hosts needs a process_allgather path)")
    is_p0 = jax.process_index() == 0
    pcount = jax.process_count()

    if args.detect_anomaly:
        from emojivoice_tpu.utils.observability import enable_nan_checks

        enable_nan_checks(True)
    if args.fast_dev_run:
        args.max_steps = 1
        args.val_every_steps = 1
        args.ckpt_every_steps = 0
        args.render_val_samples = 0

    root = cfglib.get_preset(args.preset)
    if args.mel_stats:
        stats = json.loads(Path(args.mel_stats).read_text()) if os.path.exists(args.mel_stats) \
            else json.loads(args.mel_stats)
        ds_stats = cfglib.DataStatistics(stats["mel_mean"], stats["mel_std"])
        root = dataclasses.replace(
            root,
            model=dataclasses.replace(root.model, data_statistics=ds_stats),
            data=dataclasses.replace(root.data, data_statistics=ds_stats),
        )
    model_cfg = dataclasses.replace(root.model, out_size=args.out_size)
    opt_cfg = dataclasses.replace(
        root.optimizer, lr=args.lr, scheduler=args.scheduler, warmup_steps=args.warmup_steps,
        decay_steps=args.decay_steps, scheduler_gamma=args.scheduler_gamma, lr_end=args.lr_end,
    )
    data_cfg = dataclasses.replace(
        root.data,
        train_filelist_path=args.train_filelist,
        valid_filelist_path=args.valid_filelist,
        batch_size=args.batch_size,
        seed=args.seed,
    )

    n_dev = args.num_devices or len(jax.devices())
    if args.tp > 1:
        if n_dev % args.tp:
            raise SystemExit(f"--tp {args.tp} must divide the device count {n_dev}")
        from emojivoice_tpu.parallel.tp import make_mesh_2d

        mesh = make_mesh_2d(n_dev // args.tp, args.tp)
    else:
        mesh = make_mesh(n_dev)
    n_data = n_dev // args.tp  # rows shard over the data axis only
    if pcount > 1 and args.batch_size % n_data:
        raise SystemExit(f"--batch_size {args.batch_size} must divide by the global "
                         f"data-axis size {n_data} under --dcn_*")
    if is_p0:
        print(f"[train] devices={n_dev} processes={pcount} mesh={mesh} preset={args.preset}",
              flush=True)

    params = None
    if args.from_torch_ckpt:
        from emojivoice_tpu.io.torch_ckpt import load_matcha_params

        params, loaded_cfg = load_matcha_params(args.from_torch_ckpt)
        model_cfg = dataclasses.replace(loaded_cfg, out_size=args.out_size)
        if is_p0:
            print(f"[train] fine-tuning from {args.from_torch_ckpt} "
                  f"(n_spks={model_cfg.n_spks})", flush=True)

    state = create_train_state(model_cfg, opt_cfg, seed=args.seed, params=params)
    # hparams/param-count logging (reference: utils/logging_utils.py:35-53)
    n_params = sum(int(p.size) for p in jax.tree.leaves(state.params))
    n_enc = sum(int(p.size) for p in jax.tree.leaves(state.params["params"].get("encoder", {})))
    n_dec = sum(int(p.size) for p in jax.tree.leaves(state.params["params"].get("decoder", {})))
    if is_p0:
        print(f"[train] params total={n_params/1e6:.2f}M encoder={n_enc/1e6:.2f}M "
              f"decoder={n_dec/1e6:.2f}M  lr={opt_cfg.lr} out_size={args.out_size}", flush=True)
    mgr = CheckpointManager(os.path.join(args.out_dir, "ckpts"),
                            max_to_keep=root.trainer.save_top_k)
    resumed_data_state = None
    if args.resume and mgr.latest_step() is not None:
        template = jax.device_get(
            {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        )
        restored = mgr.restore(template=template)
        state = TrainState(params=restored["params"], opt_state=restored["opt_state"],
                           step=restored["step"])
        # data-order resume: a sidecar written at save time records where in
        # the (seed, epoch)-deterministic shuffle the run was, so the resumed
        # run continues on unseen batches instead of replaying the epoch
        # (Lightning restores loader progress the same way; the per-step CFM
        # noise is already resume-correct via fold_in(rng, step))
        ds_path = Path(args.out_dir) / "ckpts" / f"data_state_{int(state.step)}.json"
        if ds_path.exists():
            try:
                cand = json.loads(ds_path.read_text())
            except (json.JSONDecodeError, OSError):
                cand = None  # truncated/corrupt sidecar: resume params anyway
            # the shuffle position is only meaningful under the settings that
            # produced it — on any mismatch fall back to an epoch-0 restart
            # (the pre-sidecar behavior) rather than silently mis-skipping
            fp = {"batch_size": args.batch_size, "seed": args.seed}
            if cand is not None and all(cand.get(k, v) == v for k, v in fp.items()):
                resumed_data_state = cand
            elif cand is not None and is_p0:
                print(f"[train] data_state ignored (saved {cand} vs current {fp})",
                      flush=True)
        if is_p0:
            print(f"[train] resumed at step {int(state.step)}"
                  + (f" (data epoch {resumed_data_state['epoch']}, "
                     f"batch {resumed_data_state['batch']})" if resumed_data_state else ""),
                  flush=True)

    train_ds = TextMelDataset(args.train_filelist, data_cfg, cache_items=args.cache_data)
    valid_ds = TextMelDataset(args.valid_filelist, data_cfg, cache_items=args.cache_data)
    min_mel = args.out_size if args.out_size else None
    # multi-process: every process walks the same global batch order/buckets
    # but loads only its row slice (data/dataset.py _collate_process_shard)
    shard = (jax.process_index(), pcount) if pcount > 1 else None
    batcher = BucketBatcher(train_ds, args.batch_size, min_mel_bucket=min_mel, seed=args.seed,
                            process_shard=shard)
    if resumed_data_state is not None and args.overfit_batches == 0:
        batcher.epoch = int(resumed_data_state["epoch"])
        batcher.skip_next = int(resumed_data_state["batch"])
    val_batcher = BucketBatcher(valid_ds, args.batch_size, min_mel_bucket=min_mel,
                                shuffle=False, seed=args.seed, process_shard=shard)

    # flag overrides the preset's trainer.precision (reference: the trainer
    # config's `precision: 16-mixed`, configs/trainer/default.yaml)
    precision = args.precision or root.trainer.precision
    k_dispatch = max(1, args.steps_per_dispatch)
    if k_dispatch > 1:
        multi_step = make_train_multi_step(model_cfg, opt_cfg, mesh=mesh, precision=precision)
    else:
        train_step = make_train_step(model_cfg, opt_cfg, mesh=mesh, precision=precision)
    eval_step = make_eval_step(model_cfg, mesh=mesh, precision=precision)
    rng = jax.random.PRNGKey(args.seed)

    metrics_path = Path(args.out_dir) / "metrics.jsonl"
    metrics_path.parent.mkdir(parents=True, exist_ok=True)

    from emojivoice_tpu.utils.observability import make_logger

    class _NullTB:  # non-zero processes: no event files, same interface
        def scalar(self, *a, **k): pass
        def image(self, *a, **k): pass
        def flush(self): pass
        def close(self): pass

    tb = make_logger(args.loggers, str(Path(args.out_dir) / "tb")) if is_p0 else _NullTB()

    render_cache: dict = {}

    def render_val_samples(step):
        if args.render_val_samples <= 0 or len(valid_ds) == 0:
            return
        from emojivoice_tpu.inference.pipeline import SynthesisPipeline

        # after the first train_step the params are jax.Arrays committed to the
        # global (possibly multi-process) mesh; a single-process jit over
        # non-addressable arrays raises — render from host copies instead
        host_params = jax.device_get(state.params)
        # ONE pipeline for the whole run: its jitted stages take params as an
        # argument, so swapping in fresh host params reuses the compiled
        # programs — rebuilding per val pass would recompile every render
        # (minutes each on a remote TPU)
        pipe = render_cache.get("pipe")
        if pipe is None:
            pipe = SynthesisPipeline(model_cfg, host_params, cleaners=data_cfg.cleaners)
            render_cache["pipe"] = pipe
        else:
            pipe.params = host_params
        for i in range(min(args.render_val_samples, len(valid_ds))):
            _, spk, text = valid_ds.items[i]
            res = pipe.synthesise([text], spks=[spk], n_timesteps=10, seed=0)[0]
            tb.image(f"val/mel_{i}", res.mel, step)
        tb.flush()

    def log_metrics(tag, step, m, extra=None):
        if not is_p0:  # metrics are mesh-reduced, identical on every process
            return
        rec = {"tag": tag, "step": int(step), "time": dt.datetime.now().isoformat(),
               **{k: (None if v is None else float(v)) for k, v in m.items()}}
        if extra:
            rec.update(extra)
        with open(metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if tag == "train":
            print(f"[train] step {int(step)}  " +
                  "  ".join(f"{k}={float(v):.4f}" for k, v in m.items()), flush=True)

    step_idx = int(state.step)
    epoch = batcher.epoch  # 0 fresh; the restored shuffle-epoch on resume
    t_start = dt.datetime.now()
    done = False
    # where the NEXT batch comes from in the deterministic shuffle — saved
    # beside each checkpoint so --resume continues on unseen data
    data_epoch, data_batch = batcher.epoch, batcher.skip_next

    def write_data_state(step):
        if not (is_p0 and args.overfit_batches == 0):
            return
        ckpt_dir = Path(args.out_dir) / "ckpts"
        # atomic write: a crash mid-write must not leave a truncated sidecar
        # that would poison every later --resume
        tmp = ckpt_dir / f".data_state_{step}.tmp"
        tmp.write_text(json.dumps({"epoch": data_epoch, "batch": data_batch,
                                   "batch_size": args.batch_size, "seed": args.seed}))
        os.replace(tmp, ckpt_dir / f"data_state_{step}.json")
        # prune sidecars whose checkpoint max_to_keep already deleted
        kept = set(mgr.all_steps())
        for p in ckpt_dir.glob("data_state_*.json"):
            try:
                s = int(p.stem.rsplit("_", 1)[1])
            except ValueError:
                continue
            if s not in kept and s != step:
                p.unlink(missing_ok=True)

    # --- convergence probe (--probe_every): a fixed train batch measured by
    # MatchaTTS.training_probe at a fixed cadence.  Where the reference's
    # only alignment evidence is eyeballing TensorBoard attention images
    # (baselightningmodule.py:177-216), this logs emergence numerically:
    # MAS diagonality, predicted-vs-MAS duration error, MAS duration drift
    # between probes, and teacher-forced reconstruction L1.
    probe_batch = None
    probe_state: dict = {}
    if args.probe_every > 0:
        if pcount > 1:
            raise SystemExit("--probe_every is single-process only")
        from emojivoice_tpu.models import MatchaTTS

        probe_batcher = BucketBatcher(train_ds, min(args.batch_size, max(1, len(train_ds))),
                                      min_mel_bucket=min_mel, shuffle=False, seed=args.seed)
        probe_batch = next(iter(probe_batcher), None)
        probe_model = MatchaTTS(cfg=model_cfg)
        probe_fn = jax.jit(lambda params, x, xl, y, yl, spks: probe_model.apply(
            params, x, xl, y, yl, spks, method=MatchaTTS.training_probe,
            rng=jax.random.PRNGKey(0)))

    def run_probe(step):
        if probe_batch is None:
            return
        out = jax.device_get(probe_fn(
            state.params, probe_batch["x"], probe_batch["x_lengths"],
            probe_batch["y"], probe_batch["y_lengths"], probe_batch.get("spks")))
        mas = np.asarray(out.pop("mas_durations"), np.float64)
        prev = probe_state.get("prev_mas")
        m = {k: float(v) for k, v in out.items()}
        # L1 drift of the MAS path between consecutive probes — a converged
        # alignment stops moving.  The first probe has no predecessor: emit
        # null, not NaN (json.dumps would write the non-standard token NaN,
        # which strict parsers like jq reject).
        m["mas_drift_l1"] = float(np.mean(np.abs(mas - prev))) if prev is not None \
            else None
        probe_state["prev_mas"] = mas
        # row-0 per-token frame counts: the degenerate random-init alignment
        # (a few tokens absorbing everything) visibly flattens as MAS locks in
        row0 = mas[0, : int(probe_batch["x_lengths"][0])].astype(int).tolist()
        log_metrics("probe", step, m, extra={"mas_dur_row0": row0})
        if is_p0:
            print(f"[train] probe step {step}  " +
                  "  ".join(f"{k}={v:.4f}" for k, v in m.items()
                            if v is not None), flush=True)
            for k, v in m.items():
                if v is not None and np.isfinite(v):
                    tb.scalar(f"probe/{k}", v, step)

    overfit_set = None
    if args.overfit_batches > 0:
        # capture the first N batches ONCE — re-slicing per epoch would pick
        # N different batches from each epoch's reshuffle, defeating the
        # can-it-memorize sanity check (reference debug/overfit.yaml)
        import itertools

        overfit_set = list(itertools.islice(iter(batcher), args.overfit_batches))
    # --- dispatch machinery.  K = --steps_per_dispatch batches are stacked
    # into one chunk and run as ONE compiled lax.scan program (K=1 keeps the
    # plain per-step program), amortizing the host↔device round trip that
    # dominates remote-TPU step wall time.  Bookkeeping is unified: host
    # tracks step_idx (int(state.step) would block the device every step),
    # and metric fetches are deferred one dispatch so the device_get
    # overlaps the NEXT chunk's compute instead of the one just queued.
    chunk: list = []
    pending_log = None  # (base_step, n_real, device-side metrics)

    def flush_log():
        nonlocal pending_log
        if pending_log is None:
            return
        base, n_real, m_dev = pending_log
        pending_log = None
        to_log = [j for j in range(n_real) if (base + j + 1) % args.log_every == 0]
        if not to_log:
            return
        m_host = jax.device_get(m_dev)  # scalars (K=1) or (K,) stacks
        for j in to_log:
            mj = {k: (v[j] if getattr(v, "ndim", 0) else v) for k, v in m_host.items()}
            log_metrics("train", base + j + 1, mj)
            if is_p0:
                for k, v in mj.items():
                    tb.scalar(f"train/{k}", float(v), base + j + 1)

    def to_wire(b):
        """--wire_f16: mels cross the host→device boundary at half width;
        the compiled steps upcast before any compute (training/state.py)."""
        if args.wire_f16 and b["y"].dtype == np.float32:
            b = {**b, "y": b["y"].astype(np.float16)}
        return b

    def run_val(step):
        vms = []
        for vb in val_batcher:
            if shard is None:
                vb = pad_batch_to_multiple(vb, n_data)
            # keep the per-batch metrics as device arrays so the
            # eval dispatches pipeline; one fetch after the sweep
            vms.append(eval_step(state.params, shard_batch(mesh, to_wire(vb)),
                                 jax.random.PRNGKey(0)))
        vms = jax.device_get(vms)
        if vms:
            avg = {k: float(np.mean([m[k] for m in vms])) for k in vms[0]}
            log_metrics("val", step, avg)
            if is_p0:
                for k, v in avg.items():
                    tb.scalar(f"val/{k}", v, step)
                render_val_samples(step)

    def dispatch_chunk():
        nonlocal state, step_idx, pending_log, done
        if not chunk:
            return
        n_real, base = len(chunk), step_idx
        if k_dispatch == 1:
            state, m = train_step(state, shard_batch(mesh, chunk[0]), rng)
        else:
            # pad a partial chunk to the compiled K by repeating the last
            # batch with step_mask 0 — an exactly-masked sub-step passes the
            # state through unchanged (make_train_multi_step)
            stacked = {key: np.stack([c[key] for c in chunk]
                                     + [chunk[-1][key]] * (k_dispatch - n_real))
                       for key in chunk[0]}
            mask = np.zeros((k_dispatch,), np.float32)
            mask[:n_real] = 1.0
            state, m = multi_step(state, shard_chunk(mesh, stacked), rng, mask)
        chunk.clear()
        flush_log()  # the PREVIOUS dispatch's metrics — overlaps this one
        pending_log = (base, n_real, m)
        step_idx = base + n_real
        # cadences fire at the first chunk boundary at/past their step
        # (identical to per-step firing when K=1)
        if args.val_every_steps > 0 and \
                base // args.val_every_steps != step_idx // args.val_every_steps:
            flush_log()  # keep metrics.jsonl ordered around the val record
            run_val(step_idx)
        if args.probe_every > 0 and \
                base // args.probe_every != step_idx // args.probe_every:
            flush_log()
            run_probe(step_idx)
        # NOTE: saves run on EVERY process — orbax is multiprocess-
        # aware (it coordinates internally and writes once); calling
        # it from process 0 alone deadlocks its sync barrier
        if args.ckpt_every_steps > 0 and \
                base // args.ckpt_every_steps != step_idx // args.ckpt_every_steps:
            mgr.save(step_idx, jax.device_get(
                {"params": state.params, "opt_state": state.opt_state, "step": state.step}),
                cfg=dataclasses.replace(root, model=model_cfg))
            write_data_state(step_idx)
        if 0 < args.max_steps <= step_idx:
            done = True

    seen_shapes: dict = {}  # (B, T_text, T_mel) -> first step dispatched
    try:
        if args.probe_every > 0 and step_idx == 0:
            run_probe(0)  # the random-init baseline the emergence is measured against
        while not done:
            epoch += 1
            if args.max_epochs > 0 and epoch > args.max_epochs:
                break
            shuffle_epoch, epoch_base = batcher.epoch, batcher.skip_next
            epoch_batches = Prefetcher(batcher) if overfit_set is None else overfit_set
            for bi, batch in enumerate(epoch_batches):
                # limit counts batches of the SHUFFLE epoch, so a resumed run
                # (bi restarts at 0 mid-epoch) honors the same global cap; on
                # hitting it the next batch is the next epoch's first
                if 0 < args.limit_train_batches <= epoch_base + bi:
                    dispatch_chunk()
                    data_epoch, data_batch = shuffle_epoch + 1, 0
                    break
                # uneven final batch: pad with zero-weight rows so it still
                # shards — no data dropped (the reference's DDP drop_last
                # analog would discard a whole tail batch per epoch, real
                # data for the 2-min-per-emoji fine-tune sets, /README.md:150).
                # In multi-process mode the batcher already emitted fixed-size
                # local slices with row_mask.
                if shard is None:
                    batch = pad_batch_to_multiple(batch, n_data)
                batch = to_wire(batch)
                # chunks are bucket-homogeneous: a shape change flushes first
                if chunk and any(batch[key].shape != chunk[-1][key].shape
                                 for key in batch):
                    dispatch_chunk()
                    if done:
                        break
                # compiled-shape census: each distinct (B, T_text, T_mel)
                # is one XLA program; the census proves recompiles stay
                # bounded by the bucket grid over a long run
                shape_key = (int(batch["x"].shape[0]), int(batch["x"].shape[1]),
                             int(batch["y"].shape[1]))
                if shape_key not in seen_shapes:
                    seen_shapes[shape_key] = step_idx + len(chunk)
                chunk.append(batch)
                data_epoch, data_batch = shuffle_epoch, epoch_base + bi + 1
                if len(chunk) == k_dispatch or \
                        (0 < args.max_steps <= step_idx + len(chunk)):
                    dispatch_chunk()
                    if done:
                        break
            else:
                # epoch completed: flush the partial chunk, then the next
                # batch is batch 0 of the next shuffle epoch (batcher.epoch
                # already advanced)
                dispatch_chunk()
                data_epoch, data_batch = batcher.epoch, 0
        dispatch_chunk()  # partial chunk left by a mid-epoch break
        flush_log()       # drain the deferred final metrics

        # shape census record: how many distinct train-step programs this
        # run compiled and when each first appeared (bounded-recompile
        # evidence for long runs; scratch_proof asserts over it)
        if seen_shapes:
            log_metrics("shapes", step_idx, {}, extra={
                "distinct_shapes": len(seen_shapes),
                "shapes": [{"batch": b, "t_text": tx, "t_mel": ty, "first_step": s}
                           for (b, tx, ty), s in sorted(seen_shapes.items())],
            })

        # final save (save_last analog) — skip if the in-loop save already
        # wrote this exact step (orbax raises StepAlreadyExistsError; force=
        # only bypasses save_interval_steps, not existing steps).
        # fast_dev_run writes NO checkpoints (reference debug/fdr.yaml) —
        # a smoke run must not pollute an existing out_dir's ckpts/
        if not args.fast_dev_run and mgr.latest_step() != step_idx:  # all processes (orbax coordinates)
            mgr.save(step_idx, jax.device_get(
                {"params": state.params, "opt_state": state.opt_state, "step": state.step}),
                cfg=dataclasses.replace(root, model=model_cfg), force=True)
            write_data_state(step_idx)

        # post-fit test pass (the reference's trainer.test after fit,
        # train.py:83-90): one evaluation sweep over a held-out filelist
        # with the final params, logged under its own tag
        if args.test_filelist:
            test_ds = TextMelDataset(args.test_filelist, data_cfg)
            test_batcher = BucketBatcher(test_ds, args.batch_size, min_mel_bucket=min_mel,
                                         shuffle=False, seed=args.seed, process_shard=shard)
            tms = []
            for tb_batch in test_batcher:
                if shard is None:
                    tb_batch = pad_batch_to_multiple(tb_batch, n_data)
                tms.append(eval_step(state.params, shard_batch(mesh, to_wire(tb_batch)),
                                     jax.random.PRNGKey(0)))
            tms = jax.device_get(tms)
            if tms:
                avg = {k: float(np.mean([m[k] for m in tms])) for k in tms[0]}
                log_metrics("test", step_idx, avg)
                if is_p0:
                    for k, v in avg.items():
                        tb.scalar(f"test/{k}", v, step_idx)
                    print("[train] test  " +
                          "  ".join(f"{k}={v:.4f}" for k, v in avg.items()), flush=True)
    finally:
        # always close loggers/checkpointer, success or failure (the
        # reference's task_wrapper "close wandb" guarantee)
        tb.close()
        mgr.close()
    if is_p0:
        print(f"[train] finished at step {step_idx} "
              f"({(dt.datetime.now() - t_start).total_seconds():.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
