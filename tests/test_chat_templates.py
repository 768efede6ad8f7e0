"""Chat template family tests (ref: tests/test-chat-template.cpp)."""

from eagle_tpu.server.chat_templates import apply_template, detect_template

MSGS = [
    {"role": "system", "content": "be nice"},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "bye"},
]


def test_chatml():
    s = apply_template(MSGS, "chatml")
    assert s.count("<|im_start|>") == 5 and s.endswith("<|im_start|>assistant\n")


def test_llama2():
    s = apply_template(MSGS, "llama2")
    assert "<<SYS>>\nbe nice\n<</SYS>>" in s
    assert s.count("[INST]") == 2


def test_llama3():
    s = apply_template(MSGS, "llama3")
    assert s.startswith("<|begin_of_text|>")
    assert s.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_vicuna():
    s = apply_template(MSGS, "vicuna")
    assert s.startswith("be nice ")
    assert s.endswith("ASSISTANT:")


def test_gemma_role_mapping():
    s = apply_template(MSGS[1:], "gemma")
    assert "<start_of_turn>model\nhello<end_of_turn>" in s


def test_detection_from_jinja():
    assert detect_template("{{ '<|im_start|>' }}") == "chatml"
    assert detect_template("blah <|start_header_id|> blah") == "llama3"
    assert detect_template("x [INST] y") == "mistral"
    assert detect_template(None) == "chatml"


# ---------------------------------------------------------------------------
# jinja template EXECUTION (--jinja: the reference's minja mode)
# ---------------------------------------------------------------------------

CHATML_JINJA = (
    "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n'"
    " + message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)

ZEPHYR_JINJA = (
    "{% for message in messages %}\n{% if message['role'] == 'user' %}\n"
    "{{ '<|user|>\n' + message['content'] + eos_token }}\n"
    "{% elif message['role'] == 'system' %}\n"
    "{{ '<|system|>\n' + message['content'] + eos_token }}\n"
    "{% elif message['role'] == 'assistant' %}\n"
    "{{ '<|assistant|>\n'  + message['content'] + eos_token }}\n"
    "{% endif %}\n{% if loop.last and add_generation_prompt %}\n"
    "{{ '<|assistant|>' }}\n{% endif %}\n{% endfor %}"
)

JMSGS = [
    {"role": "system", "content": "be brief"},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "bye?"},
]


def test_jinja_chatml_matches_native():
    from eagle_tpu.server.chat_templates import apply_template, render_jinja

    got = render_jinja(CHATML_JINJA, JMSGS, add_assistant=True)
    want = apply_template(JMSGS, template="chatml", add_assistant=True)
    assert got == want


def test_jinja_executes_real_constructs():
    """loop.last / elif / eos_token / whitespace control — the constructs real
    HF templates rely on (zephyr's official template)."""
    from eagle_tpu.server.chat_templates import render_jinja

    got = render_jinja(ZEPHYR_JINJA, JMSGS, add_assistant=True, eos_token="</s>")
    assert got.count("</s>") == 4
    assert got.rstrip().endswith("<|assistant|>")
    assert "<|system|>\nbe brief</s>" in got


def test_jinja_raise_exception_falls_back():
    from eagle_tpu.server.chat_templates import apply_template

    bad = "{{ raise_exception('nope') }}"
    # jinja failure falls back to the detected native family (chatml default)
    out = apply_template(JMSGS, jinja_src=bad, use_jinja=True)
    assert "<|im_start|>" in out


def test_jinja_tools_and_json_filter():
    from eagle_tpu.server.chat_templates import render_jinja

    src = "{% for t in tools %}{{ t['function']['name'] }}:{{ t | tojson }};{% endfor %}"
    tools = [{"function": {"name": "f1"}}, {"function": {"name": "f2"}}]
    got = render_jinja(src, [], tools=tools)
    assert got.startswith("f1:") and ";f2:" in got and '"name": "f2"' in got
