"""Host-side training driver for CTC fine-tuning.

The one trainer replacing the reference's three stacks (HF Trainer in
wav2vec_train.py, sb.Brain in speechbrain/wav2vec_train.py, Lightning in
nemo/train.py): bucketed static-shape batches feed a single donated pjit
train step; eval computes loss + greedy WER; checkpoints rotate with
save_total_limit keeping the best-WER checkpoint; early stopping on WER;
trainer_state.json log-history is written in the HF schema so
plot_convergence_curve-style tooling works unchanged; run provenance =
README + args + source snapshot (reference wav2vec_train.py:247-254,
misc.py:48).
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ssak_tpu.data.dataset import bucketed_audio_batches
from ssak_tpu.train.checkpoint import get_last_checkpoint, load_checkpoint, rotate_checkpoints, save_checkpoint
from ssak_tpu.train.steps import init_train_state, make_ctc_eval_step, make_ctc_train_step, make_optimizer
from ssak_tpu.utils.monitoring import ThroughputMeter, logger


class CTCTrainer:
    def __init__(
        self,
        cfg,
        params,
        tokenizer,
        output_dir: str,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.01,
        warmup_steps: int = 500,
        total_steps: int = 10000,
        batch_size: int = 8,
        eval_steps: int = 500,
        save_total_limit: int = 2,
        early_stopping_patience: int = 15,
        freeze_feature_encoder: bool = True,
        mask_time_prob: float = 0.05,
        augmenter=None,
        sample_rate: int = 16000,
        buckets=(2.0, 4.0, 8.0, 15.0, 30.0),
        seed: int = 69,
        normalize_text=None,
        optimizer: str = "adamw",
        schedule: str = "linear",
        head_lr: float = 1.0,
        newbob_improvement_threshold: float = 0.0025,
        newbob_annealing_factor: float = 0.8,
        newbob_patient: int = 0,
        grad_accum: int = 1,
        family: str = "wav2vec2",
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.output_dir = output_dir
        self.batch_size = batch_size
        self.eval_steps = eval_steps
        self.save_total_limit = save_total_limit
        self.early_stopping_patience = early_stopping_patience
        self.augmenter = augmenter
        self.sample_rate = sample_rate
        self.buckets = buckets
        self.seed = seed
        self.total_steps = total_steps
        self.normalize_text = normalize_text or (lambda t: t)

        os.makedirs(output_dir, exist_ok=True)
        # optimizer / schedule matrix covering the reference trainer stacks:
        # HF Trainer = AdamW + linear warmup (default); SpeechBrain recipe =
        # dual Adam(trunk)/Adadelta(head) optimizers with NewBob annealing.
        self.newbob = None
        if schedule == "newbob":
            from ssak_tpu.train.steps import NewBob, make_newbob_optimizer

            self.optimizer = make_newbob_optimizer(
                learning_rate, optimizer=optimizer, weight_decay=weight_decay, head_lr=head_lr)
            self.newbob = NewBob(learning_rate, improvement_threshold=newbob_improvement_threshold,
                                 annealing_factor=newbob_annealing_factor, patient=newbob_patient)
        elif optimizer == "sb_dual":
            from ssak_tpu.train.steps import make_sb_ctc_optimizer

            self.optimizer = make_sb_ctc_optimizer(pretrained_lr=learning_rate, head_lr=head_lr)
        else:
            self.optimizer = make_optimizer(
                learning_rate=learning_rate, weight_decay=weight_decay,
                warmup_steps=warmup_steps, total_steps=total_steps, schedule=schedule,
            )
        if grad_accum > 1:
            from ssak_tpu.train.steps import with_grad_accumulation

            self.optimizer = with_grad_accumulation(self.optimizer, grad_accum)
        self.family = family
        self.state = init_train_state(params, self.optimizer)
        self.train_step = make_ctc_train_step(
            cfg, self.optimizer, frozen_feature_encoder=freeze_feature_encoder,
            mask_time_prob=mask_time_prob, family=family,
        )
        self.eval_step = make_ctc_eval_step(cfg, family=family)
        self.log_history = []
        self.best_wer = float("inf")
        self.best_step = -1
        self.epoch = 0.0

    # --- data -------------------------------------------------------------

    def _encode_labels(self, rows):
        labels = [self.tokenizer.encode(self.normalize_text(r["text"] or "")) for r in rows]
        # pow2 label width (floor 16): a per-batch exact max would compile
        # one train program per distinct U — on the remote runtime each
        # compile is ~30 s, so a ragged corpus would spend its first epoch
        # compiling. Width bucketing keeps it O(buckets x log2(maxU));
        # CTC masks padded labels via label_lengths.
        U = max(1, max((len(l) for l in labels), default=1))
        W = 16
        while W < U:
            W *= 2
        U = W
        out = np.zeros((len(labels), U), np.int32)
        lens = np.zeros((len(labels),), np.int32)
        for i, l in enumerate(labels):
            out[i, : len(l)] = l
            lens[i] = len(l)
        return out, lens

    def _batches(self, rows, shuffle_seed=None):
        for x, lens, chunk in bucketed_audio_batches(
            rows, self.batch_size, sample_rate=self.sample_rate, buckets=self.buckets,
            output_rows=True, seed=shuffle_seed,
        ):
            real = [r for r in chunk if r is not None]
            if not real:
                continue
            if self.augmenter is not None:
                audios = [x[i, : lens[i]] for i in range(len(real))]
                audios = self.augmenter.augment_batch(audios)
                x = np.zeros_like(x)
                for i, a in enumerate(audios):
                    n = min(len(a), x.shape[1])
                    x[i, :n] = a[:n]
                    lens[i] = n
            labels, label_lens = self._encode_labels(real)
            # pad label tensor rows for the batch-pad dummies
            if len(real) < x.shape[0]:
                pad = x.shape[0] - len(real)
                labels = np.concatenate([labels, np.zeros((pad, labels.shape[1]), np.int32)])
                label_lens = np.concatenate([label_lens, np.zeros((pad,), np.int32)])
            # int16 WIRE FORMAT (audio/wire.py): a 32x10s f32 batch costs
            # ~0.55 s on the ~37 MB/s link against a 192 ms step (PERF.md
            # "sak-train end-to-end"). Augmented audio can exceed [-1, 1]
            # (speed/reverb gain) — such batches ship as f32 unchanged.
            # The cast back to f32 happens inside the compiled step
            # (steps.audio_to_f32).
            from ssak_tpu.audio.wire import encode_array

            x = encode_array(x)
            # audio seconds rides along as HOST data: the hot loop must not
            # fetch device arrays between steps (each fetch drains the
            # async dispatch queue — the device then idles over every host
            # round trip)
            audio_s = float(np.asarray(lens, np.float64).sum()) / self.sample_rate
            yield {
                "audio": jnp.asarray(x),
                "audio_lengths": jnp.asarray(lens),
                "labels": jnp.asarray(labels),
                "label_lengths": jnp.asarray(label_lens),
            }, real, audio_s

    # --- eval -------------------------------------------------------------

    def evaluate(self, eval_rows):
        from ssak_tpu.eval.wer import compute_wer

        losses, refs, hyps = [], {}, {}
        for batch, real, _audio_s in self._batches(eval_rows):
            out = self.eval_step(self.state["params"], batch)
            losses.append(float(out["loss"]))
            tokens = np.asarray(out["tokens"])
            tlens = np.asarray(out["token_lengths"])
            for i, r in enumerate(real):
                refs[r["id"]] = self.normalize_text(r["text"] or "")
                hyps[r["id"]] = self.tokenizer.decode(tokens[i, : tlens[i]])
        wer = compute_wer(refs, hyps)["wer"] if refs else float("inf")
        return {"eval_loss": float(np.mean(losses)) if losses else float("nan"), "eval_wer": wer}

    # --- checkpointing ----------------------------------------------------

    def save(self, metrics=None):
        meta = {
            "epoch": self.epoch,
            "log_history": self.log_history[-5:],
            "best_wer": self.best_wer,
            "best_step": self.best_step,
            **(metrics or {}),
        }
        path = save_checkpoint(self.output_dir, self.state, metadata=meta)
        keep = ()
        if self.best_step >= 0:
            keep = (os.path.join(self.output_dir, f"checkpoint-{self.best_step}"),)
        rotate_checkpoints(self.output_dir, self.save_total_limit, keep=keep)
        return path

    def resume(self):
        last = get_last_checkpoint(self.output_dir)
        if last is None:
            return False
        state, meta = load_checkpoint(last)
        self.state = jax.tree_util.tree_map(jnp.asarray, state)
        self.epoch = meta.get("epoch", 0.0)
        self.best_wer = meta.get("best_wer", float("inf"))
        self.best_step = meta.get("best_step", -1)
        logger.info(f"resumed from {last} (step {meta['step']})")
        return True

    def _write_trainer_state(self):
        with open(os.path.join(self.output_dir, "trainer_state.json"), "w") as f:
            json.dump(
                {
                    "global_step": int(np.asarray(self.state["step"])),
                    "epoch": self.epoch,
                    "best_metric": self.best_wer,
                    "log_history": self.log_history,
                },
                f, indent=1,
            )

    # --- main loop --------------------------------------------------------

    def train(self, train_rows, eval_rows=None, max_epochs: int = None, max_steps: int = None,
              log_interval: int = 10, final_save: bool = True):
        """final_save=False skips the end-of-run checkpoint write (used by
        repeated bench/driver passes that measure step throughput — a
        full-model checkpoint per pass is not part of the hot loop)."""
        max_steps = max_steps or self.total_steps
        meter = ThroughputMeter()
        stop = False
        bad_evals = 0
        epoch = int(self.epoch)
        from ssak_tpu.data.prefetch import prefetch_iterator

        # host-side step counter: the hot loop must not fetch
        # state["step"] (or anything else) from the device every step —
        # on the remote runtime each fetch drains the async dispatch
        # queue, serializing step N's compute against step N+1's h2d
        # transfer (PERF.md "sak-train end-to-end"). The device counter
        # stays the source of truth at resume/checkpoint time.
        gstep = int(np.asarray(self.state["step"]))
        while not stop:
            # audio decode/augment/pad runs ahead in a worker thread while
            # the chip executes the previous step (input-pipeline overlap)
            for batch, real, audio_s in prefetch_iterator(self._batches(train_rows, shuffle_seed=self.seed + epoch)):
                self.state, metrics = self.train_step(self.state, batch)
                gstep += 1
                meter.update(audio_s)
                if gstep % log_interval == 0 or gstep == 1:
                    entry = {
                        "step": gstep,
                        "epoch": round(self.epoch, 4),
                        "loss": round(float(metrics["loss"]), 4),
                        "grad_norm": round(float(metrics["grad_norm"]), 4),
                        "audio_s_per_s": round(meter.audio_seconds_per_second, 2),
                    }
                    self.log_history.append(entry)
                    logger.info(f"train {entry}")
                self.epoch += len(real) / max(1, len(train_rows))
                if eval_rows is not None and self.eval_steps and gstep % self.eval_steps == 0:
                    ev = self.evaluate(eval_rows)
                    ev["step"] = gstep
                    if self.newbob is not None:
                        from ssak_tpu.train.steps import set_learning_rate

                        new_lr = self.newbob(ev["eval_wer"])
                        self.state["opt_state"] = set_learning_rate(self.state["opt_state"], new_lr)
                        ev["learning_rate"] = new_lr
                    self.log_history.append(ev)
                    logger.info(f"eval {ev}")
                    if ev["eval_wer"] < self.best_wer:
                        self.best_wer = ev["eval_wer"]
                        self.best_step = gstep
                        bad_evals = 0
                    else:
                        bad_evals += 1
                    self.save(metrics=ev)
                    self._write_trainer_state()
                    if self.early_stopping_patience and bad_evals >= self.early_stopping_patience:
                        logger.info(f"early stopping at step {gstep} (patience {self.early_stopping_patience})")
                        stop = True
                        break
                if gstep >= max_steps:
                    stop = True
                    break
            epoch += 1
            if max_epochs is not None and epoch >= max_epochs:
                stop = True
        if eval_rows is not None:
            ev = self.evaluate(eval_rows)
            ev["step"] = int(np.asarray(self.state["step"]))
            self.log_history.append(ev)
            if ev["eval_wer"] < self.best_wer:
                self.best_wer = ev["eval_wer"]
                self.best_step = ev["step"]
        if final_save:
            self.save()
            self._write_trainer_state()
        return self.log_history
