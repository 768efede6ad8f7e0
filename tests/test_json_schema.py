"""JSON-schema -> GBNF conversion validated by running the produced grammar
(ref: tests/test-json-schema-to-grammar.cpp pattern: convert, then check
string acceptance)."""

import json

import pytest

from eagle_tpu.runtime.grammar import Grammar
from eagle_tpu.runtime.json_schema import json_schema_to_gbnf


def grammar_for(schema):
    return Grammar(json_schema_to_gbnf(schema))


def test_enum():
    g = grammar_for({"enum": ["red", "green", "blue"]})
    assert g.accepts_text('"red"', partial=False)
    assert g.accepts_text('"blue"', partial=False)
    assert not g.accepts_text('"yellow"', partial=False)


def test_const():
    g = grammar_for({"const": 42})
    assert g.accepts_text("42", partial=False)
    assert not g.accepts_text("43", partial=False)


def test_integer_and_number():
    g = grammar_for({"type": "integer"})
    assert g.accepts_text("-123", partial=False)
    assert not g.accepts_text("1.5", partial=False)
    g = grammar_for({"type": "number"})
    assert g.accepts_text("3.14", partial=False)
    assert g.accepts_text("-2e10", partial=False)


def test_string():
    g = grammar_for({"type": "string"})
    assert g.accepts_text('"hello world"', partial=False)
    assert g.accepts_text('"esc\\n"', partial=False)
    assert not g.accepts_text("hello", partial=False)


def test_object_with_required_props():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    g = grammar_for(schema)
    assert g.accepts_text('{"name": "bob", "age": 5}', partial=False)
    assert not g.accepts_text('{"age": 5}', partial=False)
    assert not g.accepts_text('{"name": "bob", "age": "five"}', partial=False)


def test_array_of_items():
    g = grammar_for({"type": "array", "items": {"type": "integer"}})
    assert g.accepts_text("[1, 2, 3]", partial=False)
    assert g.accepts_text("[]", partial=False)
    assert not g.accepts_text('["a"]', partial=False)


def test_anyof():
    g = grammar_for({"anyOf": [{"type": "integer"}, {"type": "boolean"}]})
    assert g.accepts_text("7", partial=False)
    assert g.accepts_text("true", partial=False)
    assert not g.accepts_text('"x"', partial=False)


def test_refs():
    schema = {
        "type": "object",
        "properties": {"a": {"$ref": "#/$defs/num"}},
        "required": ["a"],
        "$defs": {"num": {"type": "integer"}},
    }
    g = grammar_for(schema)
    assert g.accepts_text('{"a": 3}', partial=False)
    assert not g.accepts_text('{"a": "3"}', partial=False)
