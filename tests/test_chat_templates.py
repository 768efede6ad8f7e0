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
