"""OuteTTS text-to-speech CLI — the examples/tts/tts.cpp equivalent.

Pipeline (tts.cpp:455-973): a text-to-codes LLM (OuteTTS, qwen2-family GGUF)
generates audio-codebook tokens from a formatted prompt; the WavTokenizer
decoder (models/wavtokenizer.py) turns codes into (log-mag || phase)
spectrogram frames; an inverse STFT + Hann overlap-add renders 24 kHz PCM.

Text normalization (process_text, number_to_words), the guide-token
mechanism, audio-token extraction and the spectral math all mirror tts.cpp
(:106-270 spectral ops, :285-410 text ops, :760-775 guide tokens) — but the
ISTFT here is vectorized numpy over all frames at once, and generation runs
through our jitted decode path.

Usage:
  python -m eagle_tpu.tools.tts -m outetts.gguf -mv wavtokenizer.gguf \
      -p "Hello world" -o output.wav
"""

from __future__ import annotations

import argparse
import re
import struct
import sys

import numpy as np

SAMPLE_RATE = 24000
N_FFT = 1280
N_HOP = 320

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = {2: "twenty", 3: "thirty", 4: "forty", 5: "fifty", 6: "sixty",
         7: "seventy", 8: "eighty", 9: "ninety"}


def _less_than_thousand(num: int) -> str:
    out = ""
    if num >= 100:
        out += _ONES[num // 100] + " hundred "
        num %= 100
    if num >= 20:
        out += _TENS[num // 10]
        if num % 10:
            out += "-" + _ONES[num % 10]
    elif num > 0:
        out += _ONES[num]
    return out


def number_to_words(number_str: str) -> str:
    """tts.cpp:305-352 semantics (incl. ' point three four' decimals)."""
    try:
        int_part, _, dec_part = number_str.partition(".")
        n = int(int_part)
        out = ""
        if n == 0:
            out = "zero"
        else:
            for scale, word in ((10**9, "billion"), (10**6, "million"), (10**3, "thousand")):
                if n >= scale:
                    out += _less_than_thousand(n // scale) + f" {word} "
                    n %= scale
            if n > 0:
                out += _less_than_thousand(n)
        if dec_part:
            out += " point"
            for d in dec_part:
                out += " " + _ONES[int(d)]
        return out
    except (ValueError, IndexError):
        return " "


def process_text(text: str) -> str:
    """OuteTTS prompt normalization (tts.cpp:374-410): numbers to words,
    lowercase, punctuation to spaces, strip non-alpha, <|text_sep|> joins."""
    text = re.sub(r"\d+(\.\d+)?", lambda m: number_to_words(m.group()), text)
    text = text.lower()
    text = re.sub(r"[-_/,\.\\]", " ", text)
    text = re.sub(r"[^a-z\s]", "", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text.replace(" ", "<|text_sep|>")


# ---------------------------------------------------------------------------
# spectral ops (embd_to_audio, tts.cpp:191-270)
# ---------------------------------------------------------------------------


def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    denom = n if periodic else n - 1
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / denom))


def embd_to_audio(embd: np.ndarray, n_fft: int = N_FFT, n_hop: int = N_HOP) -> np.ndarray:
    """Spectrogram frames [T, n_embd] (log-mag || phase halves) -> waveform.

    Matches tts.cpp's poor-man irfft exactly: the frame signal is
    Re(sum_{m<N} X[m] e^{+2pi i k m / n}) / N with N = n_fft/2+1 (NOT the
    hermitian-symmetric inverse), then Hann-windowed overlap-add normalized
    by the folded squared window."""
    embd = np.asarray(embd, np.float64)
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    spec = mag * np.cos(phi) + 1j * mag * np.sin(phi)  # [T, N]
    n_bins = half  # == n_fft//2 + 1
    padded = np.zeros((n_codes, n_fft), np.complex128)
    padded[:, :n_bins] = spec
    frames = np.real(np.fft.ifft(padded, axis=1)) * (n_fft / n_bins)

    win = hann_window(n_fft)
    frames = frames * win
    env_frame = win * win

    n_win = n_fft
    n_pad = (n_win - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_win
    audio = np.zeros(n_out)
    env = np.zeros(n_out)
    for l in range(n_codes):  # noqa: E741
        audio[l * n_hop: l * n_hop + n_win] += frames[l]
        env[l * n_hop: l * n_hop + n_win] += env_frame
    audio = audio[n_pad: n_out - n_pad]
    env = env[n_pad: n_out - n_pad]
    return (audio / np.maximum(env, 1e-12)).astype(np.float32)


def save_wav16(path: str, audio: np.ndarray, sample_rate: int = SAMPLE_RATE):
    """Minimal 16-bit mono PCM WAV writer (tts.cpp:60-104)."""
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    data = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


# ---------------------------------------------------------------------------
# prompting + generation
# ---------------------------------------------------------------------------

# Default speaker reference (OuteTTS v0.2 en-male-1 style voice data): word,
# duration tag, then the codebook tokens for that word. Same voice data the
# reference bakes in (tts.cpp:554-585, text form of the token-id constant).
DEFAULT_VOICE = (
    "<|text_start|>the<|text_sep|>overall<|text_sep|>package<|text_sep|>from"
    "<|text_sep|>just<|text_sep|>two<|text_sep|>people<|text_sep|>is<|text_sep|>"
    "pretty<|text_sep|>remarkable<|text_sep|>sure<|text_sep|>i<|text_sep|>have"
    "<|text_sep|>some<|text_sep|>critiques<|text_sep|>about<|text_sep|>some"
    "<|text_sep|>of<|text_sep|>the<|text_sep|>gameplay<|text_sep|>aspects"
    "<|text_sep|>but<|text_sep|>its<|text_sep|>still<|text_sep|>really"
    "<|text_sep|>enjoyable<|text_sep|>and<|text_sep|>it<|text_sep|>looks"
    "<|text_sep|>lovely<|text_sep|>"
)


def audio_token_range(tokenizer) -> tuple[int, int]:
    """Locate the audio-code token block: <|0|> .. <|N|>. tts.cpp hardcodes
    151672..155772 for OuteTTS-0.2; we resolve from the vocab and fall back
    to those constants."""
    lookup = {p: i for i, p in enumerate(getattr(tokenizer, "tokens", []))}
    base = lookup.get("<|0|>")
    if base is None:
        return 151672, 155772
    i = 0
    while lookup.get(f"<|{i + 1}|>") == base + i + 1:
        i += 1
    return base, base + i


def generate_codes(engine, prompt_ids, guide_tokens=None, max_new_tokens=768,
                   top_k=4, seed=0):
    """Token-by-token decode with optional guide-token forcing
    (tts.cpp:760-775: after each newline token 198, the next sampled token is
    replaced by the next word's first token to pin the transcript).

    Forcing requires host control between steps, so this prefills once and
    then runs single-token jitted forwards (one compile), sampling top-k on
    host — the generate_constrained pattern."""
    import jax.numpy as jnp

    from ..models.llama import llama_forward
    from ..runtime.generate import pad_bucket
    from ..runtime.kvcache import causal_mask_from_tags
    from ..runtime.sampling import SamplerConfig, transform_logits

    gen = engine._plain_generator()
    scfg = SamplerConfig(greedy=False, temperature=1.0, top_k=top_k)
    guide = list(guide_tokens or [])
    newline_id = engine.tokenizer.encode("\n")[-1]

    prompt = np.asarray(prompt_ids, np.int32)
    n = len(prompt)
    t = pad_bucket(n)
    padded = np.zeros((gen.batch, t), np.int32)
    padded[0, :n] = prompt
    logits, _, gen.kv = gen._prefill_jit(
        gen.params, gen.kv, jnp.asarray(padded), jnp.asarray([n], np.int32), t=t
    )
    rng = np.random.default_rng(seed)
    out: list[int] = []
    pos = n
    next_uses_guide = True
    while len(out) < max_new_tokens and pos < gen.max_seq:
        l = np.asarray(transform_logits(logits[0], scfg)).astype(np.float64)
        p = np.exp(l - l.max())
        p /= p.sum()
        tok = int(rng.choice(len(p), p=p))
        if guide and next_uses_guide and tok != gen.eos_id:
            tok = guide.pop(0)
        next_uses_guide = tok == newline_id
        out.append(tok)
        if tok == gen.eos_id:
            break
        p_arr = jnp.full((gen.batch, 1), pos, jnp.int32)
        gen.kv = gen.kv.with_tags(p_arr, p_arr)
        mask = causal_mask_from_tags(gen.kv.slot_pos, p_arr)
        fo = llama_forward(
            gen.params, gen.cfg, jnp.full((gen.batch, 1), tok, jnp.int32),
            p_arr, gen.kv, p_arr, mask,
            backend=gen.backend, compute_dtype=gen.compute_dtype,
        )
        gen.kv = fo.kv
        logits = fo.logits[:, 0]
        pos += 1
    return out


def prepare_guide_tokens(tokenizer, processed: str, newline_id: int):
    """First token of each word in the processed transcript (tts.cpp:427)."""
    words = processed.split("<|text_sep|>")
    toks = [newline_id]
    for w in words:
        if not w:
            continue
        enc = tokenizer.encode(w)
        if enc:
            toks.append(enc[0])
    return toks


def main(argv=None):
    ap = argparse.ArgumentParser(description="OuteTTS text to speech")
    ap.add_argument("-m", "--model", required=True, help="text-to-codes LLM GGUF")
    ap.add_argument("-mv", "--model-vocoder", required=True,
                    help="wavtokenizer-dec GGUF")
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("--n-predict", type=int, default=768)
    ap.add_argument("--top-k", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--use-guide-tokens", action="store_true")
    args = ap.parse_args(argv)

    from ..api import Engine, EngineConfig

    eng = Engine(EngineConfig(model_path=args.model))
    tok = eng.tokenizer

    clean = process_text(args.prompt)
    print(f"prompt: '{clean}'", file=sys.stderr)
    prompt_ids = (
        tok.encode("<|im_start|>\n")
        + tok.encode(DEFAULT_VOICE)
        + tok.encode(clean)
        + tok.encode("<|text_end|>\n")
    )
    newline_id = tok.encode("\n")[-1]
    guide = (prepare_guide_tokens(tok, clean, newline_id)
             if args.use_guide_tokens else None)

    codes = generate_codes(eng, prompt_ids, guide_tokens=guide,
                           max_new_tokens=args.n_predict, top_k=args.top_k,
                           seed=args.seed)
    lo, hi = audio_token_range(tok)
    codes = [c - lo for c in codes if lo <= c <= hi]
    print(f"audio codes: {len(codes)}", file=sys.stderr)
    if not codes:
        print("no audio tokens generated", file=sys.stderr)
        return 1

    from ..models.wavtokenizer import load_wavtok_params, wavtok_forward

    params, wcfg = load_wavtok_params(args.model_vocoder)
    embd = np.asarray(wavtok_forward(params, wcfg, np.asarray(codes, np.int32)))
    audio = embd_to_audio(embd)
    audio[: SAMPLE_RATE // 4] = 0.0  # fade the leading artifact (tts.cpp:941)
    save_wav16(args.output, audio)
    print(f"wrote {args.output}: {len(audio)} samples "
          f"({len(audio)/SAMPLE_RATE:.2f}s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
