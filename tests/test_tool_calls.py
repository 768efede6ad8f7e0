"""Tool-call parsing parity with the reference's common/chat.cpp parsers.

Case shapes mirror the reference's tests/test-chat.cpp (delta-message
round-trips there; raw-parse assertions here, same inputs/outputs)."""

import json

from eagle_tpu.server.tool_calls import (
    ChatMsg,
    build_tool_grammar,
    detect_format,
    parse,
)


def test_detect_format_markers():
    assert detect_format("...<｜tool▁calls▁begin｜>...") == "deepseek_r1"
    assert detect_format("...<|END_THINKING|><|START_ACTION|>...") == "command_r7b"
    assert detect_format("...>>>all...") == "functionary_v3_2"
    assert detect_format("... functools[...") == "firefunction_v2"
    assert detect_format("...<tool_call>...") == "hermes_2_pro"
    assert detect_format("<|start_header_id|>x<function=f>") == "functionary_v3_1"
    assert (
        detect_format("<|start_header_id|>ipython<|end_header_id|><|python_tag|>")
        == "llama_3_x_builtin"
    )
    assert detect_format("<|start_header_id|>ipython<|end_header_id|>") == "llama_3_x"
    assert detect_format("...[TOOL_CALLS]...") == "mistral_nemo"
    assert detect_format("{{ messages }}") == "generic"
    assert detect_format("<tool_call>", has_tools=False) == "content_only"


def test_content_only():
    msg = parse("Hello there", "content_only")
    assert msg.content == "Hello there" and not msg.tool_calls


def test_hermes_2_pro_single():
    txt = '<tool_call>\n{"name": "special_function", "arguments": {"arg1": 1}}\n</tool_call>'
    msg = parse(txt, "hermes_2_pro")
    assert len(msg.tool_calls) == 1
    tc = msg.tool_calls[0]
    assert tc.name == "special_function"
    assert json.loads(tc.arguments) == {"arg1": 1}
    assert msg.content == ""


def test_hermes_2_pro_content_then_calls():
    txt = (
        "I'll call it now.\n<tool_call>\n"
        '{"name": "f", "arguments": {}}\n</tool_call>\n<tool_call>\n'
        '{"name": "g", "arguments": {"x": "y"}}\n</tool_call>'
    )
    msg = parse(txt, "hermes_2_pro")
    assert msg.content == "I'll call it now."
    assert [t.name for t in msg.tool_calls] == ["f", "g"]


def test_hermes_malformed_falls_back_to_content():
    txt = "<tool_call>\n{not json"
    msg = parse(txt, "hermes_2_pro")
    assert msg.content == txt and not msg.tool_calls


def test_llama_3_x_json_call():
    txt = '{"name": "special_function", "parameters": {"arg1": 1}}'
    msg = parse(txt, "llama_3_x")
    assert msg.tool_calls[0].name == "special_function"
    assert json.loads(msg.tool_calls[0].arguments) == {"arg1": 1}


def test_llama_3_x_builtin_python_tag():
    txt = '<|python_tag|>brave_search.call(query="Who?")'
    msg = parse(txt, "llama_3_x_builtin")
    assert msg.tool_calls[0].name == "brave_search"
    assert json.loads(msg.tool_calls[0].arguments) == {"query": "Who?"}


def test_mistral_nemo():
    txt = '[TOOL_CALLS][{"name": "special_function", "arguments": {"arg1": 1}, "id": "123456789"}]'
    msg = parse(txt, "mistral_nemo")
    assert msg.tool_calls[0].id == "123456789"
    assert msg.tool_calls[0].name == "special_function"


def test_firefunction_v2():
    txt = ' functools[{"name": "special_function", "arguments": {"arg1": 1}}]'
    msg = parse(txt, "firefunction_v2")
    assert msg.tool_calls[0].name == "special_function"


def test_deepseek_r1_reasoning_and_call():
    txt = (
        "<think>I'm\nthinking</think>"
        "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>special_function\n"
        '```json\n{"arg1": 1}\n```<｜tool▁call▁end｜><｜tool▁calls▁end｜>'
    )
    msg = parse(txt, "deepseek_r1", extract_reasoning=True)
    assert msg.reasoning_content == "I'm\nthinking"
    assert msg.tool_calls[0].name == "special_function"
    msg2 = parse(txt, "deepseek_r1", extract_reasoning=False)
    assert "<think>" in msg2.content and msg2.tool_calls


def test_deepseek_r1_plain_content():
    msg = parse("<think>hmm</think>The answer is 4.", "deepseek_r1", extract_reasoning=True)
    assert msg.reasoning_content == "hmm"
    assert msg.content == "The answer is 4."


def test_functionary_v3_2_content_and_calls():
    txt = 'all\nHello, world!\n>>>special_function\n{"arg1": 1}'
    msg = parse(txt, "functionary_v3_2")
    assert msg.tool_calls[0].name == "special_function"
    assert "Hello, world!" in msg.content
    plain = parse("all\njust text", "functionary_v3_2")
    assert plain.content == "just text" and not plain.tool_calls


def test_functionary_v3_1():
    txt = '<function=special_function>{"arg1": 1}</function>'
    msg = parse(txt, "functionary_v3_1")
    assert msg.tool_calls[0].name == "special_function"
    py = parse("<|python_tag|>print(1)", "functionary_v3_1")
    assert py.tool_calls[0].name == "python"
    assert json.loads(py.tool_calls[0].arguments) == {"code": "print(1)"}


def test_command_r7b():
    txt = (
        "<|START_THINKING|>deep thought<|END_THINKING|>"
        '<|START_ACTION|>[{"tool_call_id": "0", "tool_name": "special_function", '
        '"parameters": {"arg1": 1}}]<|END_ACTION|>'
    )
    msg = parse(txt, "command_r7b", extract_reasoning=True)
    assert msg.reasoning_content == "deep thought"
    assert msg.tool_calls[0].name == "special_function"
    assert msg.tool_calls[0].id == "0"
    resp = parse("<|START_RESPONSE|>42<|END_RESPONSE|>", "command_r7b")
    assert resp.content == "42"


def test_generic():
    txt = '{"tool_calls": [{"name": "f", "arguments": {"a": 1}, "id": "9"}]}'
    msg = parse(txt, "generic")
    assert msg.tool_calls[0].id == "9"
    one = parse('{"tool_call": {"name": "g", "arguments": {}}}', "generic")
    assert one.tool_calls[0].name == "g"
    resp = parse('{"response": "hi"}', "generic")
    assert resp.content == "hi" and not resp.tool_calls


def test_as_openai_shape():
    msg = parse('{"tool_call": {"name": "g", "arguments": {"q": 1}}}', "generic")
    d = msg.tool_calls[0].as_openai()
    assert d["type"] == "function" and d["function"]["name"] == "g"


TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "special_function",
            "description": "I'm special",
            "parameters": {
                "type": "object",
                "properties": {"arg1": {"type": "integer"}},
                "required": ["arg1"],
            },
        },
    }
]


def test_build_tool_grammar_hermes_accepts_call():
    g, triggers = build_tool_grammar(TOOLS, "hermes_2_pro", required=True)
    txt = '<tool_call> {"name": "special_function", "arguments": {"arg1": 1}} </tool_call> '
    assert g.accepts_text(txt)
    assert not g.accepts_text('<tool_call> {"name": "nope", "arguments": {}} </tool_call> ')
    assert triggers == ["<tool_call>"]


def test_build_tool_grammar_lazy_trigger():
    g, _ = build_tool_grammar(TOOLS, "hermes_2_pro", required=False)
    assert g.awaiting_trigger
    from eagle_tpu.runtime.grammar import TokenTrie

    pieces = ["Hello", "<tool_call>", ' {"name": "special_function", "arguments": {"arg1": 2}}',
              " </tool_call> ", "zzz"]
    trie = TokenTrie(pieces)
    assert g.token_mask(trie).all()  # unconstrained pre-trigger
    g.accept_token(0, pieces[0])
    g.accept_token(1, pieces[1])  # trigger
    assert not g.awaiting_trigger
    mask = g.token_mask(trie)
    assert mask[2] and not mask[4]


def test_mistral_grammar():
    g, _ = build_tool_grammar(TOOLS, "mistral_nemo", required=True)
    assert g.accepts_text('[TOOL_CALLS] [ {"name": "special_function", "arguments": {"arg1": 1}} ]')
