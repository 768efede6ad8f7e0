"""On-device sampler chain.

Functional counterpart of llama.cpp's sampler chain (src/llama-sampling.cpp,
common/sampling.cpp): a fixed pipeline of logit transforms followed by
greedy/categorical selection, entirely jittable (no host round-trip per token).
Chain order mirrors common_sampler's default: penalties -> top-k -> typical ->
top-p -> min-p -> temperature -> dist.

Penalty state is carried as a dense per-vocab count tensor (static shape)
rather than llama.cpp's ring buffer of recent tokens."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SamplerState:
    """Per-sequence mutable sampler state threaded through decode loops:
    token occurrence counts (penalties window ~ whole context), the
    mirostat surprise target mu, and a recent-token ring for the DRY
    sampler's suffix matching."""

    counts: jax.Array  # [B, V] f32
    mu: jax.Array  # [B] f32
    recent: jax.Array  # [B, W] i32, last W tokens (left-padded with -1)

    @staticmethod
    def create(batch: int, vocab: int, tau: float = 5.0, window: int = 64):
        return SamplerState(
            counts=jnp.zeros((batch, vocab), jnp.float32),
            mu=jnp.full((batch,), 2.0 * tau, jnp.float32),
            recent=jnp.full((batch, window), -1, jnp.int32),
        )

    def observe(self, tokens: jax.Array) -> "SamplerState":
        b = tokens.shape[0]
        return dataclasses.replace(
            self,
            counts=self.counts.at[jnp.arange(b), tokens].add(1.0),
            recent=jnp.concatenate(
                [self.recent[:, 1:], tokens[:, None].astype(jnp.int32)], axis=1
            ),
        )


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    temperature: float = 0.8
    # DRY repetition penalty (llama_sampler_dry, src/llama-sampling.cpp:1773;
    # penalty = multiplier * base^(repeat_len - allowed_length) for tokens
    # that would extend a repeated sequence). 0 multiplier = disabled.
    dry_multiplier: float = 0.0
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    #: token ids that break sequence matching (the reference processes
    #: breaker *strings* into token sequences; here breakers are token ids)
    dry_sequence_breakers: tuple = ()
    top_k: int = 40  # <= 0: disabled
    top_p: float = 0.95  # >= 1: disabled
    min_p: float = 0.05  # <= 0: disabled
    typical_p: float = 1.0  # >= 1: disabled
    top_n_sigma: float = 0.0  # <= 0: disabled
    xtc_probability: float = 0.0  # 0: disabled
    xtc_threshold: float = 0.1
    penalty_repeat: float = 1.0  # 1.0: disabled
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    #: tuple of (token_id, bias) pairs, applied first (llama_sampler_logit_bias)
    logit_bias: tuple = ()
    # mirostat v2 (llama_sampler_mirostat_v2): 0 = off
    # mirostat v1 uses the top-m surprise regression (llama_sampler_mirostat);
    # v2 is the simplified truncation variant
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    greedy: bool = False

    @property
    def stateful(self) -> bool:
        return self.needs_penalties or self.mirostat in (1, 2) or self.dry_multiplier > 0

    @property
    def needs_penalties(self) -> bool:
        return (
            self.penalty_repeat != 1.0
            or self.penalty_freq != 0.0
            or self.penalty_present != 0.0
        )


def apply_penalties(
    logits: jax.Array, counts: jax.Array, cfg: SamplerConfig
) -> jax.Array:
    """llama_sampler_penalties semantics (src/llama-sampling.cpp): repeat
    penalty divides positive logits / multiplies negative ones; freq/present
    subtract linearly in count. `counts` [V] = occurrences within the penalty
    window."""
    seen = counts > 0
    l = logits
    if cfg.penalty_repeat != 1.0:
        l = jnp.where(
            seen, jnp.where(l > 0, l / cfg.penalty_repeat, l * cfg.penalty_repeat), l
        )
    if cfg.penalty_freq != 0.0 or cfg.penalty_present != 0.0:
        l = l - counts * cfg.penalty_freq - seen.astype(l.dtype) * cfg.penalty_present
    return l


def top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _NEG_INF, logits)


def top_p_mask(logits: jax.Array, p: float) -> jax.Array:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the top token)
    keep_sorted = cum - probs < p
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < threshold, _NEG_INF, logits)


def min_p_mask(logits: jax.Array, p: float) -> jax.Array:
    if p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = probs.max(axis=-1, keepdims=True) * p
    return jnp.where(probs < cutoff, _NEG_INF, logits)


def typical_mask(logits: jax.Array, p: float) -> jax.Array:
    """Locally-typical sampling (llama_sampler_typical)."""
    if p >= 1.0:
        return logits
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    entropy = -jnp.sum(probs * log_probs, axis=-1, keepdims=True)
    shifted = jnp.abs(-log_probs - entropy)
    order = jnp.argsort(shifted, axis=-1)
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = (cum - probs_sorted) < p
    keep = jnp.put_along_axis(
        jnp.zeros_like(keep_sorted), order, keep_sorted, axis=-1, inplace=False
    )
    return jnp.where(keep, logits, _NEG_INF)


def top_n_sigma_mask(logits: jax.Array, n: float) -> jax.Array:
    """llama_sampler_top_n_sigma: keep logits within n standard deviations of
    the max."""
    if n <= 0:
        return logits
    valid = logits > _NEG_INF / 2
    mean = jnp.mean(jnp.where(valid, logits, 0), axis=-1, keepdims=True)
    var = jnp.mean(jnp.where(valid, (logits - mean) ** 2, 0), axis=-1, keepdims=True)
    cutoff = logits.max(axis=-1, keepdims=True) - n * jnp.sqrt(var)
    return jnp.where(logits < cutoff, _NEG_INF, logits)


def xtc_mask(logits: jax.Array, key: jax.Array, prob: float, threshold: float) -> jax.Array:
    """Exclude-top-choices (llama_sampler_xtc): with probability `prob`, mask
    every token above `threshold` probability EXCEPT the least likely of them."""
    if prob <= 0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    above = probs >= threshold
    n_above = above.sum(axis=-1, keepdims=True)
    # keep the smallest-probability qualifying token: mask only tokens with
    # prob strictly greater than the minimum qualifying prob
    min_above = jnp.min(jnp.where(above, probs, jnp.inf), axis=-1, keepdims=True)
    drop = above & (probs > min_above) & (n_above >= 2)
    fire = jax.random.uniform(key, logits.shape[:-1] + (1,)) < prob
    return jnp.where(fire & drop, _NEG_INF, logits)


def apply_logit_bias(logits: jax.Array, bias: tuple) -> jax.Array:
    if not bias:
        return logits
    ids = jnp.asarray([b[0] for b in bias], jnp.int32)
    vals = jnp.asarray([b[1] for b in bias], jnp.float32)
    return logits.at[..., ids].add(vals)


def transform_logits(
    logits: jax.Array,
    cfg: SamplerConfig,
    penalty_counts: jax.Array | None = None,
    key: jax.Array | None = None,
) -> jax.Array:
    """Apply the chain's logit transforms (everything except the final draw)."""
    l = logits.astype(jnp.float32)
    l = apply_logit_bias(l, cfg.logit_bias)
    if cfg.needs_penalties and penalty_counts is not None:
        l = apply_penalties(l, penalty_counts, cfg)
    if cfg.greedy:
        return l
    l = top_n_sigma_mask(l, cfg.top_n_sigma)
    l = top_k_mask(l, cfg.top_k)
    l = typical_mask(l, cfg.typical_p)
    l = top_p_mask(l, cfg.top_p)
    l = min_p_mask(l, cfg.min_p)
    if cfg.xtc_probability > 0 and key is not None:
        key, sub = jax.random.split(key)
        l = xtc_mask(l, sub, cfg.xtc_probability, cfg.xtc_threshold)
    if cfg.temperature > 0:
        l = l / cfg.temperature
    return l


def sample(
    logits: jax.Array,
    key: jax.Array,
    cfg: SamplerConfig,
    penalty_counts: jax.Array | None = None,
) -> jax.Array:
    """Draw token ids from [..., V] logits. Greedy if cfg.greedy or temp<=0."""
    key, tkey = jax.random.split(key)
    l = transform_logits(logits, cfg, penalty_counts, key=tkey)
    if cfg.greedy or cfg.temperature <= 0:
        return jnp.argmax(l, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatchedSamplerParams:
    """Per-slot sampler parameters as [B] arrays — the continuous batcher's
    equivalent of llama-server's per-request sampling params
    (server.cpp:272-278): every row of the batch samples under its own
    temperature/top-k/top-p/min-p/penalties inside ONE compiled step.

    All transforms are branchless: neutral values (top_k<=0, top_p>=1,
    min_p<=0, penalty_repeat==1, ...) are exact no-ops per-row."""

    temperature: jax.Array  # [B] f32; <= 0 with greedy=True -> argmax
    top_k: jax.Array  # [B] i32; <= 0 disabled
    top_p: jax.Array  # [B] f32; >= 1 disabled
    min_p: jax.Array  # [B] f32; <= 0 disabled
    penalty_repeat: jax.Array  # [B] f32; == 1 disabled
    penalty_freq: jax.Array  # [B] f32
    penalty_present: jax.Array  # [B] f32
    greedy: jax.Array  # [B] bool
    spec_k: jax.Array  # [B] i32: per-slot max accepted drafts per cycle

    @staticmethod
    def create(batch: int, default: "SamplerConfig | None" = None, n_draft: int = 5):
        c = default or SamplerConfig(greedy=True)
        f = lambda v: jnp.full((batch,), v, jnp.float32)
        return BatchedSamplerParams(
            temperature=f(c.temperature),
            top_k=jnp.full((batch,), c.top_k, jnp.int32),
            top_p=f(c.top_p),
            min_p=f(c.min_p),
            penalty_repeat=f(c.penalty_repeat),
            penalty_freq=f(c.penalty_freq),
            penalty_present=f(c.penalty_present),
            greedy=jnp.full((batch,), bool(c.greedy), bool),
            spec_k=jnp.full((batch,), n_draft, jnp.int32),
        )

    def set_row(self, i: int, cfg: "SamplerConfig", spec_k: int | None = None):
        """Host-side: returns params with row i configured from `cfg`."""
        upd = dict(
            temperature=self.temperature.at[i].set(cfg.temperature),
            top_k=self.top_k.at[i].set(cfg.top_k),
            top_p=self.top_p.at[i].set(cfg.top_p),
            min_p=self.min_p.at[i].set(cfg.min_p),
            penalty_repeat=self.penalty_repeat.at[i].set(cfg.penalty_repeat),
            penalty_freq=self.penalty_freq.at[i].set(cfg.penalty_freq),
            penalty_present=self.penalty_present.at[i].set(cfg.penalty_present),
            greedy=self.greedy.at[i].set(bool(cfg.greedy)),
        )
        if spec_k is not None:
            upd["spec_k"] = self.spec_k.at[i].set(spec_k)
        return dataclasses.replace(self, **upd)


def _batched_transform(logits: jax.Array, bp: BatchedSamplerParams,
                       counts: jax.Array | None) -> jax.Array:
    """[B, V] logits -> transformed logits, rowwise params, branch-free."""
    l = logits.astype(jnp.float32)
    v = l.shape[-1]
    if counts is not None:
        seen = counts > 0
        rep = bp.penalty_repeat[:, None]
        l = jnp.where(seen, jnp.where(l > 0, l / rep, l * rep), l)
        l = l - counts * bp.penalty_freq[:, None] - seen * bp.penalty_present[:, None]
    # top-k with per-row k: threshold = k-th largest (disabled rows -> -inf)
    sorted_desc = jnp.sort(l, axis=-1)[:, ::-1]
    k_idx = jnp.clip(bp.top_k - 1, 0, v - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    k_on = (bp.top_k > 0)[:, None] & (bp.top_k < v)[:, None]
    l = jnp.where(k_on & (l < kth), _NEG_INF, l)
    # top-p per row
    sorted_desc = jnp.sort(l, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = cum - probs < bp.top_p[:, None]
    thr = jnp.min(jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1, keepdims=True)
    p_on = (bp.top_p < 1.0)[:, None]
    l = jnp.where(p_on & (l < thr), _NEG_INF, l)
    # min-p per row
    pr = jax.nn.softmax(l, axis=-1)
    cutoff = pr.max(axis=-1, keepdims=True) * bp.min_p[:, None]
    m_on = (bp.min_p > 0)[:, None]
    l = jnp.where(m_on & (pr < cutoff), _NEG_INF, l)
    temp = jnp.maximum(bp.temperature, 1e-6)[:, None]
    return l / temp


def sample_batched(
    logits: jax.Array,  # [B, V]
    key: jax.Array,
    bp: BatchedSamplerParams,
    counts: jax.Array | None = None,
) -> jax.Array:
    """Per-row configured draw: greedy rows take argmax of the (penalized)
    logits; sampling rows draw categorically from the transformed ones."""
    l = _batched_transform(logits, bp, counts)
    greedy_tok = jnp.argmax(jnp.where(l > _NEG_INF / 2, l, _NEG_INF), axis=-1)
    samp_tok = jax.random.categorical(key, l, axis=-1)
    greedy = bp.greedy | (bp.temperature <= 0)
    return jnp.where(greedy, greedy_tok, samp_tok).astype(jnp.int32)


def transformed_probs_batched(
    logits: jax.Array,  # [B, V]
    bp: BatchedSamplerParams,
    counts: jax.Array | None = None,
) -> jax.Array:
    """Per-row transformed sampling distribution [B, V]: softmax of the
    transformed logits for sampling rows; one-hot(argmax) for greedy rows —
    the point mass the greedy draw "samples" from. This is the p (target) /
    q (draft) of stochastic speculative acceptance; using the SAME transform
    chain on both sides makes the accepted stream exactly distributed as
    plain sampling under that chain."""
    l = _batched_transform(logits, bp, counts)
    p = jax.nn.softmax(l, axis=-1)
    greedy = bp.greedy | (bp.temperature <= 0)
    best = jnp.argmax(jnp.where(l > _NEG_INF / 2, l, _NEG_INF), axis=-1)
    onehot = jax.nn.one_hot(best, l.shape[-1], dtype=p.dtype)
    return jnp.where(greedy[:, None], onehot, p)


def speculative_accept(
    drafts: jax.Array,  # [B, K] draft tokens, sampled from q
    q_probs: jax.Array,  # [B, K, V] draft distributions
    p_probs: jax.Array,  # [B, K+1, V] target distributions (K = bonus pos)
    spec_k: jax.Array,  # [B] per-row accepted-draft cap
    greedy: jax.Array,  # [B] rows reduce to exact-match + argmax correction
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Stochastic speculative-sampling acceptance — the reference's
    min(1, p/q) accept + residual-distribution resample
    (examples/speculative/speculative-eagle.cpp:294-320) — batched over rows
    and all K positions in one branch-free program.

    Position k's draft is accepted when u_k < p(d_k)/q(d_k); the first
    rejection resamples from norm(max(p - q, 0)); full acceptance draws the
    bonus token from p at position K (the zero-padded q row makes the
    residual formula collapse to p there); a spec_k cap truncates with a
    plain draw from p at the cut. Greedy rows carry one-hot p/q, for which
    the ratio test IS exact-match and every correction is the target argmax —
    mixed batches need no branching.

    Returns (tokens [B, K+1], n_acc [B]): tokens[:, :n_acc] are accepted
    drafts and tokens[:, n_acc] the correction/bonus. By the speculative
    sampling theorem the emitted stream is distributed EXACTLY as sampling
    token-by-token from p."""
    b, k, v = q_probs.shape
    ukey, ckey = jax.random.split(key)
    p_tok = jnp.take_along_axis(p_probs[:, :k], drafts[..., None], axis=-1)[..., 0]
    q_tok = jnp.take_along_axis(q_probs, drafts[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(ukey, (b, k))
    acc = u * jnp.maximum(q_tok, 1e-20) < p_tok  # u < p/q without the divide
    n_raw = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
    n_acc = jnp.minimum(n_raw, spec_k)
    capped = n_acc < n_raw
    q_pad = jnp.concatenate([q_probs, jnp.zeros((b, 1, v), q_probs.dtype)], axis=1)
    p_j = jnp.take_along_axis(p_probs, n_acc[:, None, None], axis=1)[:, 0]
    q_j = jnp.take_along_axis(q_pad, n_acc[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(p_j - q_j, 0.0)
    rs = resid.sum(-1, keepdims=True)
    corr = jnp.where(
        capped[:, None], p_j,
        jnp.where(rs > 0, resid / jnp.maximum(rs, 1e-20), p_j),
    )
    tok_s = jax.random.categorical(ckey, jnp.log(corr + 1e-30), axis=-1)
    tok_g = jnp.argmax(corr, axis=-1)
    tok_corr = jnp.where(greedy, tok_g, tok_s).astype(jnp.int32)
    drafts_pad = jnp.concatenate([drafts, drafts[:, -1:]], axis=1)
    pos = jnp.arange(k + 1)[None, :]
    tokens = jnp.where(pos == n_acc[:, None], tok_corr[:, None], drafts_pad)
    return tokens.astype(jnp.int32), n_acc


def dry_penalty(logits: jax.Array, recent: jax.Array, cfg: SamplerConfig) -> jax.Array:
    """DRY ("don't repeat yourself") repetition penalty
    (llama_sampler_dry, src/llama-sampling.cpp:1773, orig. Koboldcpp PR#982).

    For every candidate token z: find the longest suffix of the recent-token
    window that also occurs earlier in the window immediately followed by z;
    if that match length exceeds `dry_allowed_length`, subtract
    multiplier * base^(len - allowed). Fully vectorized: match run-lengths
    are computed for all window positions at once (O(W^2) elementwise work,
    trivially parallel on the VPU — no Z-algorithm needed).

    logits [V]; recent [W] (left-padded with -1)."""
    w = recent.shape[0]
    v = logits.shape[-1]
    # breaker tokens must never match (reference: matching resets at breakers)
    brk = jnp.zeros((w,), bool)
    for b in cfg.dry_sequence_breakers:
        brk = brk | (recent == b)
    left = jnp.where(brk, -2, recent)  # -2 vs -3: breakers compare unequal
    right = jnp.where(brk, -3, recent)
    valid = recent >= 0

    # l[i] = run length of left[i-1-j] == right[w-1-j] over j = 0..;
    # i.e. how long the window suffix matches the text ending at position i
    i_idx = jnp.arange(w)[:, None]  # candidate positions i
    j_idx = jnp.arange(w)[None, :]  # depth into the suffix
    li = i_idx - 1 - j_idx
    ri = w - 1 - j_idx
    ok = (li >= 0) & (li < ri)  # proper earlier occurrence, in-window
    eq = jnp.where(
        ok,
        (left[jnp.clip(li, 0)] == right[ri]) & valid[jnp.clip(li, 0)] & valid[ri],
        False,
    )
    run = jnp.cumprod(eq.astype(jnp.int32), axis=1).sum(axis=1)  # [W] l(i)

    # candidate z = recent[i] extends the match of length run[i]
    cand = jnp.where((run > 0) & valid & ~brk, recent, v)  # v = out-of-range
    pen_len = jnp.zeros((v + 1,), jnp.int32).at[cand].max(run)[:v]
    fire = pen_len >= cfg.dry_allowed_length
    pen = cfg.dry_multiplier * jnp.power(
        cfg.dry_base, (pen_len - cfg.dry_allowed_length).astype(jnp.float32)
    )
    return jnp.where(fire, logits - pen, logits)


def _mirostat_v1(logits: jax.Array, key: jax.Array, cfg: SamplerConfig, mu: jax.Array,
                 m: int = 100):
    """llama_sampler_mirostat (v1): estimate the Zipf exponent s_hat from the
    top-m probabilities, derive the truncation k from the surprise target mu,
    top-k sample, then adapt mu."""
    b, v = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, _ = jax.lax.top_k(probs, m)  # [B, m]
    # s_hat = sum(t_i * b_i) / sum(b_i^2), t_i = ln((i+2)/(i+1)),
    # b_i = ln(p_i / p_{i+1})  (llama-sampling.cpp mirostat s_hat regression)
    idx = jnp.arange(m - 1, dtype=jnp.float32)
    t_i = jnp.log((idx + 2.0) / (idx + 1.0))
    ratio = top_p[:, :-1] / jnp.maximum(top_p[:, 1:], 1e-10)
    b_i = jnp.log(jnp.maximum(ratio, 1e-10))
    s_hat = jnp.sum(t_i * b_i, axis=-1) / jnp.maximum(jnp.sum(b_i * b_i, axis=-1), 1e-10)
    eps = s_hat - 1.0
    k = jnp.power(
        (eps * jnp.power(2.0, mu)) / (1.0 - jnp.power(jnp.float32(v), -eps)),
        1.0 / jnp.maximum(s_hat, 1e-6),
    )
    k = jnp.clip(k, 1, v).astype(jnp.int32)  # [B]
    # per-row k truncation: keep logits >= k-th largest
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    kth = jnp.take_along_axis(sorted_desc, jnp.clip(k - 1, 0, v - 1)[:, None], axis=-1)
    l = jnp.where(logits < kth, _NEG_INF, logits) / jnp.maximum(cfg.temperature, 1e-6)
    tok = jax.random.categorical(key, l, axis=-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    obs = -logp[jnp.arange(b), tok] / jnp.log(2.0)
    mu_new = mu - cfg.mirostat_eta * (obs - cfg.mirostat_tau)
    return tok, mu_new


def _mirostat_v2(logits: jax.Array, key: jax.Array, cfg: SamplerConfig, mu: jax.Array):
    """llama_sampler_mirostat_v2: truncate tokens whose surprise (-log2 p)
    exceeds mu, sample, then adapt mu toward the target entropy tau."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    surprise = -logp / jnp.log(2.0)  # [B, V]
    keep = surprise <= mu[:, None]
    # always keep the argmax
    best = jnp.argmax(logits, axis=-1)
    keep = keep.at[jnp.arange(logits.shape[0]), best].set(True)
    l = jnp.where(keep, logits / jnp.maximum(cfg.temperature, 1e-6), _NEG_INF)
    tok = jax.random.categorical(key, l, axis=-1).astype(jnp.int32)
    obs = surprise[jnp.arange(logits.shape[0]), tok]
    mu_new = mu - cfg.mirostat_eta * (obs - cfg.mirostat_tau)
    return tok, mu_new


def sample_stateful(
    logits: jax.Array,  # [B, V]
    key: jax.Array,
    cfg: SamplerConfig,
    state: SamplerState,
) -> tuple[jax.Array, SamplerState]:
    """Stateful chain step: penalties from state.counts, mirostat-v2 mu
    adaptation, and count updates for the drawn token."""
    key, tkey, mkey = jax.random.split(key, 3)
    logits = logits.astype(jnp.float32)
    if cfg.dry_multiplier > 0:
        logits = jax.vmap(lambda lg, r: dry_penalty(lg, r, cfg))(logits, state.recent)
    if cfg.mirostat in (1, 2):
        l = apply_logit_bias(logits, cfg.logit_bias)
        if cfg.needs_penalties:
            l = jax.vmap(lambda lg, c: apply_penalties(lg, c, cfg))(l, state.counts)
        mfn = _mirostat_v1 if cfg.mirostat == 1 else _mirostat_v2
        tok, mu = mfn(l, mkey, cfg, state.mu)
        state = dataclasses.replace(state, mu=mu)
    else:
        if cfg.needs_penalties:
            l = jax.vmap(
                lambda lg, c: transform_logits(lg, cfg, c, key=tkey)
            )(logits, state.counts)
        else:
            l = transform_logits(logits, cfg, key=tkey)
        if cfg.greedy or cfg.temperature <= 0:
            tok = jnp.argmax(l, axis=-1).astype(jnp.int32)
        else:
            tok = jax.random.categorical(key, l, axis=-1).astype(jnp.int32)
    return tok, state.observe(tok)
