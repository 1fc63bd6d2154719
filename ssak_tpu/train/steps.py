"""pjit train/eval steps for CTC (wav2vec2) and seq2seq (Whisper).

One donated, jit-compiled step replaces the reference's three trainer
stacks' inner loops (HF Trainer / sb.Brain.fit_batch / Lightning): forward
in bfloat16, loss in float32, grads averaged over the 'data' mesh axis by
XLA (sharding-propagated psum), optax optimizer update in the same program
(no separate optimizer step dispatch).
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ssak_tpu.ops.ctc_pallas import ctc_loss_fast as ctc_loss


def audio_to_f32(a):
    """Device-side decode of the int16 wire format: the remote runtime's
    host->device link moves ~37 MB/s (measured — PERF.md), so train batches
    ship as int16 PCM sample words (exact for file-sourced audio) and are
    cast back to normalized f32 HERE, inside the compiled step. Float
    audio (the |x|>1 guard path, or any direct caller) passes through
    unchanged — the branch is resolved at trace time by dtype."""
    if jnp.issubdtype(a.dtype, jnp.integer):
        return a.astype(jnp.float32) * (1.0 / 32768.0)
    return a


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    warmup_steps: int = 500,
    total_steps: int = 100000,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float = 1.0,
    schedule: str = "linear",
):
    """AdamW with warmup schedule — the reference trainers' default
    (HF Trainer AdamW linear-warmup, NeMo adamw CosineAnnealing)."""
    if schedule == "linear":
        sched = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.linear_schedule(learning_rate, 0.0, max(1, total_steps - warmup_steps)),
            ],
            [warmup_steps],
        )
    elif schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(0.0, learning_rate, warmup_steps, total_steps)
    elif schedule == "constant":
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps), optax.constant_schedule(learning_rate)],
            [warmup_steps],
        )
    else:
        raise ValueError(schedule)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=b1, b2=b2, weight_decay=weight_decay),
    )
    return tx


def make_newbob_optimizer(
    learning_rate: float,
    optimizer: str = "adamw",
    weight_decay: float = 0.01,
    rho: float = 0.95,
    grad_clip: float = 1.0,
    head_lr: float = 1.0,
):
    """Optimizer with a host-settable learning rate for NewBob annealing
    (SpeechBrain's scheduler: anneal on small relative WER improvement,
    reference train/speechbrain/wav2vec_train.py NewBob + yaml lr_annealing).
    The LR lives in opt_state.hyperparams — update it between steps with
    set_learning_rate(); no recompilation (it is a traced scalar).

    optimizer='sb_dual' reproduces the full SpeechBrain recipe: Adam(lr) on
    the trunk, Adadelta(head_lr) on the CTC head, BOTH annealed together
    (the injected lr scales the head LR proportionally)."""

    @optax.inject_hyperparams
    def _make(lr):
        if optimizer == "adadelta":
            inner = optax.adadelta(lr, rho=rho)
        elif optimizer == "sb_dual":
            return make_grouped_optimizer(
                {"pretrained": optax.adam(lr), "head": optax.adadelta(lr * (head_lr / learning_rate), rho=rho)},
                rules=[(r"/lm_head/", "head")],
                default="pretrained",
                grad_clip=grad_clip,
            )
        else:
            inner = optax.adamw(lr, weight_decay=weight_decay)
        return optax.chain(optax.clip_by_global_norm(grad_clip), inner)

    return _make(learning_rate)


def set_learning_rate(opt_state, lr):
    """New opt_state with the injected learning rate replaced (recurses
    into optax.MultiSteps wrapping when gradient accumulation is on)."""
    if hasattr(opt_state, "inner_opt_state"):  # MultiStepsState
        return opt_state._replace(inner_opt_state=set_learning_rate(opt_state.inner_opt_state, lr))
    hp = dict(opt_state.hyperparams)
    key = "lr" if "lr" in hp else "learning_rate"
    hp[key] = jnp.asarray(lr, jnp.asarray(hp[key]).dtype)
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state) -> float:
    if hasattr(opt_state, "inner_opt_state"):  # MultiStepsState
        return get_learning_rate(opt_state.inner_opt_state)
    hp = opt_state.hyperparams
    return float(hp["lr" if "lr" in hp else "learning_rate"])


def with_grad_accumulation(optimizer, every: int):
    """Gradient accumulation (reference HF Trainer
    gradient_accumulation_steps): grads of `every` consecutive micro-steps
    are averaged on device; the wrapped optimizer applies one update per
    `every` micro-steps. Keeps the train step a single compiled program —
    the accumulator lives in opt_state."""
    if every <= 1:
        return optimizer
    return optax.MultiSteps(optimizer, every_k_schedule=every)


class NewBob:
    """SpeechBrain NewBob annealing: when the relative improvement of the
    tracked metric (WER/loss) falls below improvement_threshold, multiply
    the LR by annealing_factor (after `patient` tolerated evals)."""

    def __init__(self, initial_lr: float, improvement_threshold: float = 0.0025,
                 annealing_factor: float = 0.8, patient: int = 0):
        self.lr = float(initial_lr)
        self.improvement_threshold = improvement_threshold
        self.annealing_factor = annealing_factor
        self.patient = patient
        self._waited = 0
        self._prev = None

    def __call__(self, metric: float):
        """Feed the new eval metric; returns the (possibly annealed) LR."""
        if self._prev is not None and self._prev != 0:
            improvement = (self._prev - metric) / abs(self._prev)
            if improvement < self.improvement_threshold:
                if self._waited >= self.patient:
                    self.lr *= self.annealing_factor
                    self._waited = 0
                else:
                    self._waited += 1
            else:
                self._waited = 0
        # NewBob tracks the best metric seen, not the last one
        self._prev = metric if self._prev is None else min(self._prev, metric)
        return self.lr


def make_grouped_optimizer(optimizers: dict, rules, default: str, grad_clip: float = 1.0):
    """Per-parameter-group optimizers, the SpeechBrain dual-optimizer
    capability (reference speechbrain/wav2vec_train.py:95-137: pretrained
    wav2vec2 under Adam lr 1e-4, DNN head + ctc_lin under Adadelta lr 1.0).

    optimizers: {group_name: optax transform}; rules: [(path_regex,
    group_name)] matched against /-joined param paths, first match wins;
    default: group for unmatched params."""
    import re

    from ssak_tpu.parallel.mesh import _tree_map_with_path

    def labels(params):
        def lab(path, _leaf):
            for pattern, name in rules:
                if re.search(pattern, path):
                    return name
            return default

        return _tree_map_with_path(lab, params)

    return optax.chain(optax.clip_by_global_norm(grad_clip), optax.multi_transform(optimizers, labels))


def make_sb_ctc_optimizer(pretrained_lr: float = 1e-4, head_lr: float = 1.0,
                          rho: float = 0.95, grad_clip: float = 1.0):
    """The reference SpeechBrain recipe's exact pairing for wav2vec2-CTC:
    Adam on the pretrained trunk, Adadelta on the CTC head."""
    return make_grouped_optimizer(
        {"pretrained": optax.adam(pretrained_lr), "head": optax.adadelta(head_lr, rho=rho)},
        rules=[(r"/lm_head/", "head")],
        default="pretrained",
        grad_clip=grad_clip,
    )


def init_train_state(params, optimizer, quantized: bool = False):
    """quantized=True: optimizer state is built over the trainable float
    partition only (int8/int4 base weights are frozen — the QLoRA shape of
    the reference's load_in_8bit + PEFT path)."""
    if quantized:
        from ssak_tpu.models.quant import partition_trainable

        trainable, _ = partition_trainable(params)
        opt_state = optimizer.init(trainable)
    else:
        opt_state = optimizer.init(params)
    return {"params": params, "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}


def make_ctc_train_step(
    cfg, optimizer, frozen_feature_encoder: bool = True,
    mask_time_prob: float = 0.0, mask_time_length: int = 10,
    family: str = "wav2vec2", moe_aux_weight: float = 0.01,
):
    """CTC step for either acoustic family ('wav2vec2' or 'conformer').
    batch: {audio (B,T), audio_lengths (B,), labels (B,U),
    label_lengths (B,)}. Returns (state, metrics).

    frozen_feature_encoder mirrors reference wav2vec_train.py:318
    freeze_feature_encoder (conv feature extractor grads zeroed;
    wav2vec2 only). mask_time_prob > 0 enables on-device SpecAugment span
    masking of hidden frames (key derived from the step counter).
    """
    from ssak_tpu.models import wav2vec2

    def loss_fn(params, batch, step):
        audio = audio_to_f32(batch["audio"])
        if family == "conformer":
            from ssak_tpu.models import conformer

            time_mask = None
            if mask_time_prob > 0:
                from ssak_tpu.augment.specaugment import mask_time_indices

                B, T = audio.shape
                F = conformer.subsampled_length(cfg, conformer.mel_frame_count(cfg, T))
                key = jax.random.fold_in(jax.random.PRNGKey(0), step)
                time_mask = mask_time_indices(key, (B, F), mask_prob=mask_time_prob, mask_length=mask_time_length)
            log_probs, frame_lengths = conformer.ctc_log_probs(
                params, audio, cfg, batch["audio_lengths"], time_mask=time_mask)
        else:
            time_mask = None
            if mask_time_prob > 0:
                from ssak_tpu.augment.specaugment import mask_time_indices

                B, T = audio.shape
                F = wav2vec2.feature_extract_output_length(cfg, T)
                key = jax.random.fold_in(jax.random.PRNGKey(0), step)
                time_mask = mask_time_indices(key, (B, F), mask_prob=mask_time_prob, mask_length=mask_time_length)
            # freeze via stop_gradient: the conv-stack VJP (the most expensive
            # backward in the model at 16 kHz sequence length) is never built
            aux = [] if getattr(cfg, "num_experts", 0) else None
            log_probs, frame_lengths = wav2vec2.ctc_log_probs(
                params, audio, cfg, batch["audio_lengths"], time_mask=time_mask,
                freeze_feature_encoder=frozen_feature_encoder, aux_out=aux)
        loss = ctc_loss(log_probs, frame_lengths, batch["labels"], batch["label_lengths"], blank_id=cfg.blank_id)
        if family != "conformer" and getattr(cfg, "num_experts", 0) and aux:
            # MoE load-balancing penalty (GShard) averaged over layers
            loss = loss + moe_aux_weight * sum(aux) / len(aux)
        return loss

    def mask_frozen(grads):
        if not frozen_feature_encoder or family != "wav2vec2":
            return grads
        g = dict(grads)
        g["feature_extractor"] = jax.tree_util.tree_map(jnp.zeros_like, grads["feature_extractor"])
        return g

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch, state["step"])
        grads = mask_frozen(grads)
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state, "step": state["step"] + 1}
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step


def make_ctc_eval_step(cfg, family: str = "wav2vec2"):
    from ssak_tpu.ops.ctc import ctc_greedy_decode

    if family == "conformer":
        from ssak_tpu.models import conformer as _family
    else:
        from ssak_tpu.models import wav2vec2 as _family

    @jax.jit
    def step(params, batch):
        log_probs, frame_lengths = _family.ctc_log_probs(params, audio_to_f32(batch["audio"]), cfg, batch["audio_lengths"])
        loss = ctc_loss(log_probs, frame_lengths, batch["labels"], batch["label_lengths"], blank_id=cfg.blank_id)
        tokens, lengths = ctc_greedy_decode(log_probs, frame_lengths, blank_id=cfg.blank_id)
        return {"loss": loss, "tokens": tokens, "token_lengths": lengths}

    return step


def make_whisper_train_step(cfg, optimizer, grad_mask=None, quantized: bool = False):
    """Whisper seq2seq step. batch: {mel (B,n_mels,T), tokens_in (B,U),
    tokens_out (B,U), token_mask (B,U)} (teacher forcing).
    grad_mask: optional fn(grads)->grads (e.g. lora_grad_mask for
    adapter-only fine-tuning, the reference's PEFT path).

    quantized=True (reference whisper_train.py:374-407 load_in_8bit/4bit +
    LoRA): params hold int8/int4 base kernels; gradients are taken only
    w.r.t. the trainable float partition (LoRA leaves when present), the
    frozen quantized base is closed over — integer leaves never enter
    autodiff or the optimizer."""
    from ssak_tpu.models import whisper

    def loss_fn(params, batch):
        enc = whisper.encode(params, batch["mel"], cfg)
        logits = whisper.decode_train(params, batch["tokens_in"], enc, cfg)
        return whisper.cross_entropy_loss(logits, batch["tokens_out"], batch["token_mask"])

    if quantized:
        from ssak_tpu.models.quant import merge_partition, partition_trainable

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            trainable, frozen = partition_trainable(state["params"])
            loss, grads = jax.value_and_grad(
                lambda t: loss_fn(merge_partition(t, frozen), batch)
            )(trainable)
            gnorm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, state["opt_state"], trainable)
            params = merge_partition(optax.apply_updates(trainable, updates), frozen)
            new_state = {"params": params, "opt_state": opt_state, "step": state["step"] + 1}
            return new_state, {"loss": loss, "grad_norm": gnorm}

        return step

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch)
        if grad_mask is not None:
            grads = grad_mask(grads)
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state, "step": state["step"] + 1}
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step


def shard_train_step(step_fn, mesh, state_shardings=None):
    """Wrap a jitted step with explicit input shardings: batch arrays are
    sharded on the 'data' axis (leading dim), state per state_shardings
    (replicated when None)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def place_batch(batch):
        return {k: jax.device_put(v, data_shard) for k, v in batch.items()}

    def wrapped(state, batch):
        return step_fn(state, place_batch(batch))

    return wrapped
