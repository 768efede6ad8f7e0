"""Chat template application — the src/llama-chat.cpp equivalent.

The GGUF usually embeds the Jinja source at `tokenizer.chat_template`; like
the reference, we don't run Jinja — we detect the family by substring
(llm_chat_detect_template) and apply a native implementation. The most common
families are covered; unknown templates fall back to chatml."""

from __future__ import annotations

from typing import Callable

Msg = dict  # {"role": ..., "content": ...}


def _chatml(messages: list[Msg], add_assistant: bool = True) -> str:
    out = [f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n" for m in messages]
    if add_assistant:
        out.append("<|im_start|>assistant\n")
    return "".join(out)


def _llama2(messages: list[Msg], add_assistant: bool = True) -> str:
    out = []
    system = ""
    for m in messages:
        if m["role"] == "system":
            system = m["content"]
        elif m["role"] == "user":
            content = m["content"]
            if system:
                content = f"<<SYS>>\n{system}\n<</SYS>>\n\n{content}"
                system = ""
            out.append(f"[INST] {content} [/INST]")
        else:
            out.append(f" {m['content']} ")
    return "".join(out)


def _llama3(messages: list[Msg], add_assistant: bool = True) -> str:
    out = ["<|begin_of_text|>"]
    for m in messages:
        out.append(
            f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n{m['content']}<|eot_id|>"
        )
    if add_assistant:
        out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(out)


def _mistral(messages: list[Msg], add_assistant: bool = True) -> str:
    out = []
    for m in messages:
        if m["role"] == "user":
            out.append(f"[INST] {m['content']} [/INST]")
        elif m["role"] == "assistant":
            out.append(f"{m['content']}</s>")
        else:  # system folded into first user turn by convention
            out.append(f"[INST] {m['content']} [/INST]")
    return "".join(out)


def _vicuna(messages: list[Msg], add_assistant: bool = True) -> str:
    sys_txt = (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions."
    )
    parts = []
    for m in messages:
        if m["role"] == "system":
            sys_txt = m["content"]
        elif m["role"] == "user":
            parts.append(f"USER: {m['content']}")
        else:
            parts.append(f"ASSISTANT: {m['content']}</s>")
    tail = " ASSISTANT:" if add_assistant else ""
    return sys_txt + " " + " ".join(parts) + tail


def _zephyr(messages: list[Msg], add_assistant: bool = True) -> str:
    out = [f"<|{m['role']}|>\n{m['content']}<|endoftext|>\n" for m in messages]
    if add_assistant:
        out.append("<|assistant|>\n")
    return "".join(out)


def _gemma(messages: list[Msg], add_assistant: bool = True) -> str:
    out = []
    for m in messages:
        role = "model" if m["role"] == "assistant" else "user"
        out.append(f"<start_of_turn>{role}\n{m['content']}<end_of_turn>\n")
    if add_assistant:
        out.append("<start_of_turn>model\n")
    return "".join(out)


def _phi3(messages: list[Msg], add_assistant: bool = True) -> str:
    out = [f"<|{m['role']}|>\n{m['content']}<|end|>\n" for m in messages]
    if add_assistant:
        out.append("<|assistant|>\n")
    return "".join(out)


def _deepseek3(messages: list[Msg], add_assistant: bool = True) -> str:
    out = []
    for m in messages:
        if m["role"] == "system":
            out.append(m["content"])
        elif m["role"] == "user":
            out.append(f"<｜User｜>{m['content']}")
        else:
            out.append(f"<｜Assistant｜>{m['content']}<｜end▁of▁sentence｜>")
    if add_assistant:
        out.append("<｜Assistant｜>")
    return "".join(out)


TEMPLATES: dict[str, Callable] = {
    "chatml": _chatml,
    "llama2": _llama2,
    "llama3": _llama3,
    "mistral-v7": _mistral,
    "mistral": _mistral,
    "vicuna": _vicuna,
    "zephyr": _zephyr,
    "gemma": _gemma,
    "phi3": _phi3,
    "deepseek3": _deepseek3,
}

# substring -> family (llm_chat_detect_template's heuristics)
_DETECT = [
    ("<|im_start|>", "chatml"),
    ("<|start_header_id|>", "llama3"),
    ("[INST]", "mistral"),
    ("<<SYS>>", "llama2"),
    ("<start_of_turn>", "gemma"),
    ("<|assistant|>", "zephyr"),
    ("<|end|>", "phi3"),
    ("<｜Assistant｜>", "deepseek3"),
    ("USER:", "vicuna"),
]


def detect_template(jinja_src: str | None) -> str:
    if not jinja_src:
        return "chatml"
    for needle, family in _DETECT:
        if needle in jinja_src:
            return family
    return "chatml"


def render_jinja(
    jinja_src: str,
    messages: list[Msg],
    add_assistant: bool = True,
    bos_token: str = "",
    eos_token: str = "",
    tools: list | None = None,
) -> str:
    """Execute the model's own chat template (the reference vendors minja, a
    C++ jinja engine, for its --jinja mode — common/chat.cpp; in Python the
    real jinja2 gives full fidelity). Sandboxed like transformers'
    apply_chat_template, with the same extra globals templates expect
    (raise_exception, strftime_now)."""
    import json as _json
    from datetime import datetime

    from jinja2 import TemplateError
    from jinja2.sandbox import ImmutableSandboxedEnvironment

    env = ImmutableSandboxedEnvironment(trim_blocks=True, lstrip_blocks=True)

    def raise_exception(msg):
        raise TemplateError(str(msg))

    env.globals["raise_exception"] = raise_exception
    env.globals["strftime_now"] = lambda fmt: datetime.now().strftime(fmt)
    env.filters.setdefault("tojson", lambda v, **kw: _json.dumps(v, **kw))
    tmpl = env.from_string(jinja_src)
    return tmpl.render(
        messages=messages,
        add_generation_prompt=add_assistant,
        bos_token=bos_token,
        eos_token=eos_token,
        tools=tools,
    )


def apply_template(
    messages: list[Msg], template: str | None = None, jinja_src: str | None = None,
    add_assistant: bool = True, use_jinja: bool = False,
    bos_token: str = "", eos_token: str = "", tools: list | None = None,
) -> str:
    """use_jinja executes the GGUF's embedded template verbatim (the
    reference's --jinja mode); otherwise the detected native family renders
    (llm_chat_apply_template). Jinja failures fall back to the family."""
    if use_jinja and jinja_src:
        try:
            return render_jinja(
                jinja_src, messages, add_assistant,
                bos_token=bos_token, eos_token=eos_token, tools=tools,
            )
        except Exception:
            pass
    family = template or detect_template(jinja_src)
    fn = TEMPLATES.get(family, _chatml)
    return fn(messages, add_assistant)
