"""Interactive multi-turn chat with KV reuse across turns — the reference's
llama-cli conversation mode (examples/main/main.cpp interactive loop; the
incremental formatting is common_chat_format_single, common/chat.cpp:289).

Turn mechanics mirror the reference exactly:
- turn 1 renders the whole conversation with the detected chat template and
  prefills it;
- every later turn feeds ONLY the template diff for the new user message
  (format_single) on top of the live cache (llama_decode with n_past > 0 in
  the reference; `Generator._extend` here), so the shared history is never
  re-prefetched or re-computed;
- the final sampled token of a turn (usually EOS/EOT — the template's own
  closing tag) is *pending*: sampled but not yet fed, exactly like the
  reference keeps it in `embd` for the next decode call. The next turn's
  feed starts with it, which is what makes the cache text line up with what
  format_single assumes was already rendered.

Everything inside a turn runs in the same compiled chunk programs as plain
generation (no new per-token host round-trips)."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..server.chat_templates import apply_template, format_single
from .generate import Generator, pad_bucket
from .sampling import SamplerConfig, SamplerState, sample, sample_stateful


@dataclasses.dataclass
class ChatSession:
    gen: Generator
    tokenizer: Any
    template: str | None = None  # explicit family name; None = detect
    jinja_src: str | None = None  # GGUF tokenizer.chat_template
    use_jinja: bool = False
    system: str | None = None

    def __post_init__(self):
        self.messages: list[dict] = []
        if self.system:
            self.messages.append({"role": "system", "content": self.system})
        self.pos = 0  # tokens in the cache
        self.pending: int | None = None  # last sampled, not-yet-fed token
        self.fed: list[int] = []  # every token id fed, in order (for tests)
        self.keep = 0  # context-shift header size (first turn's prompt)

    # ------------------------------------------------------------------

    def _ensure_room(self, needed: int):
        """Context shift when the next feed/decode would overflow the cache —
        main.cpp's conversation-mode eviction (keep the header, drop half of
        the rest, re-rope the survivors; examples/main/main.cpp:452-460)."""
        if needed + 1 >= self.gen.max_seq // 2:
            raise ValueError(
                f"turn of {needed} tokens cannot fit a {self.gen.max_seq} cache")
        from ..ops.rope import rope_freqs_cfg
        from .kvcache import context_shift

        while self.pos + needed + 1 >= self.gen.max_seq:
            keep = min(self.keep, self.gen.max_seq // 4)
            # never discard more rows than are actually occupied past the
            # header (a second shift in the same feed would over-subtract)
            n_discard = min((self.gen.max_seq - keep) // 2, self.pos - keep)
            if n_discard <= 0:
                raise ValueError(
                    f"cannot free room for {needed} tokens: header keep={keep} "
                    f"fills the {self.gen.max_seq} cache")
            inv_freq, _ = rope_freqs_cfg(self.gen.cfg)
            self.gen.kv = context_shift(self.gen.kv, inv_freq, keep, n_discard)
            self.pos -= n_discard
            del self.fed[keep : keep + n_discard]

    def _feed(self, ids: list[int]):
        """Extend the cache with `ids` at self.pos; return last-token logits."""
        self._ensure_room(len(ids))
        n = len(ids)
        t = pad_bucket(n)
        padded = np.zeros((self.gen.batch, t), np.int32)
        padded[0, :n] = ids
        logits, self.gen.kv = self.gen._extend_jit(
            self.gen.params, self.gen.kv, jnp.asarray(padded),
            jnp.full((self.gen.batch,), self.pos, jnp.int32),
            jnp.asarray([n], np.int32), t=t,
            kv_limit=self.gen.kv_read_bucket(self.pos + t),
        )
        self.fed += list(ids)
        self.pos += n
        return logits

    def turn_tokens(self, text: str) -> list[int]:
        """Token ids this user turn feeds (pending + template diff)."""
        new_msg = {"role": "user", "content": text}
        if self.pos == 0:
            rendered = apply_template(
                self.messages + [new_msg], template=self.template,
                jinja_src=self.jinja_src, add_assistant=True,
                use_jinja=self.use_jinja,
            )
            return self.tokenizer.encode(rendered)
        suffix = format_single(
            self.messages, new_msg, template=self.template,
            jinja_src=self.jinja_src, add_assistant=True,
            use_jinja=self.use_jinja,
        )
        head = [self.pending] if self.pending is not None else []
        return head + self.tokenizer.encode(suffix, add_bos=False)

    def ask(
        self,
        text: str,
        max_new_tokens: int = 256,
        sampler: SamplerConfig | None = None,
        seed: int = 0,
        on_token: Callable[[int], None] | None = None,
        chunk: int = 32,
    ) -> str:
        """One user turn: feed the incremental prompt, decode the assistant
        reply (EOS-terminated), record both in the message history."""
        scfg = sampler or SamplerConfig(greedy=True)
        ids = self.turn_tokens(text)
        self.pending = None
        self.messages.append({"role": "user", "content": text})
        first_turn = self.pos == 0
        logits = self._feed(ids)
        if first_turn:
            self.keep = self.pos  # header survives context shifts
        self.last_prompt_len = self.pos  # context length before this decode
        self.last_out: list[int] = []  # every token sampled this turn

        key = jax.random.PRNGKey(seed ^ (self.pos * 0x9E3779B1 & 0x7FFFFFFF))
        key, sub = jax.random.split(key)
        sstate = (
            SamplerState.create(self.gen.batch, self.gen.cfg.vocab_size,
                                scfg.mirostat_tau)
            if scfg.stateful else None
        )
        if sstate is not None:
            first, sstate = sample_stateful(logits, sub, scfg, sstate)
        else:
            first = sample(logits, sub, scfg)

        out = [int(first[0])]
        eos = self.tokenizer.eos_id
        content: list[int] = []
        done = out[0] == eos
        if not done:
            if on_token:
                on_token(out[0])
            content.append(out[0])
        tok = first
        while not done and len(out) < max_new_tokens:
            if self.pos + chunk + 1 >= self.gen.max_seq:
                self._ensure_room(chunk)
            steps = min(chunk, max_new_tokens - len(out))
            key, sub = jax.random.split(key)
            toks, self.gen.kv, sstate = self.gen._decode_jit(
                self.gen.params, self.gen.kv, tok,
                jnp.full((self.gen.batch,), self.pos, jnp.int32), sub, scfg,
                n_steps=steps, sampler_state=sstate,
                kv_limit=self.gen.kv_read_bucket(self.pos + steps),
            )
            chunk_toks = np.asarray(toks)[0].tolist()
            fed_in_chunk = steps  # first/out[-1] + samples 0..steps-2
            for j, tk in enumerate(chunk_toks):
                out.append(int(tk))
                if tk == eos:
                    # tokens after EOS were speculatively fed: only slots
                    # < pos + j + 1 hold real context (`first` at pos, then
                    # chunk_toks[0..j-1]); invalidate the rest by tag
                    fed_in_chunk = j + 1
                    done = True
                    break
                if on_token:
                    on_token(int(tk))
                content.append(int(tk))
            self.pos += fed_in_chunk
            if done and fed_in_chunk < steps:
                # drop the speculatively-fed post-EOS rows (tag invalidation
                # is the whole rollback — the functional-cache equivalent of
                # llama_kv_cache_seq_rm)
                self.gen.kv = self.gen.kv.rollback(
                    jnp.full((self.gen.batch,), self.pos, jnp.int32)
                )
            # the chunk fed `tok` then its own samples (minus the last/EOS)
            self.fed += [int(np.asarray(tok)[0])] + chunk_toks[: fed_in_chunk - 1]
            tok = toks[:, -1]
        self.pending = out[-1]
        self.last_out = out
        reply = self.tokenizer.decode(content, skip_special=True)
        self.messages.append({"role": "assistant", "content": reply})
        return reply
