"""Text functions shared by the MapReduce fidelity path and LLM ops.

The tokenizer reproduces the reference demo's ``strtok`` semantics
exactly (`/root/reference/test/user_tasks.cc:15`): split ONLY on the
five delimiter chars space, comma, period, double-quote, single-quote;
runs collapse; empty tokens drop; tab/newline are NOT delimiters;
case-sensitive.
"""

from __future__ import annotations

import re

# The five strtok delimiters from test/user_tasks.cc:15: " ,.\"'"
STRTOK_DELIMS = " ,.\"'"
# Complement-class regex: tokens are maximal runs of non-delimiter chars
# (exactly what strtok returns for this delimiter set).
TOKEN_RE = re.compile(r"[^ ,.\"']+")

# Same class for engines that split on the delimiters instead:
# Java (Spark F.split) and RE2 (DuckDB string_split_regex) both accept it.
SPLIT_REGEX = "[ ,.\"']+"
# DuckDB SQL-literal spelling (single quote doubled inside the string).
SPLIT_REGEX_SQL = "[ ,.\"'']+"

# BPE-ish token pattern with explicit classes (identical in Java regex
# and RE2 — avoids \w/\s dialect differences).
BPE_TOKEN_REGEX = "[A-Za-z0-9_]+|[^A-Za-z0-9_ ]"


def tokenize(line: str) -> list[str]:
    """strtok-equivalent tokenization (the pure-Python oracle of
    SURVEY §5 item 1)."""
    return TOKEN_RE.findall(line)


def wordcount_mapper(line: str):
    """The reference demo mapper (test/user_tasks.cc:12-23): one
    ``(token, "1")`` emit per token occurrence."""
    for tok in tokenize(line):
        yield tok, "1"


def wordcount_reducer(key: str, values: list[str]):
    """The reference demo reducer (test/user_tasks.cc:29-33): sum of
    integer-parsed values."""
    yield key, str(sum(int(v) for v in values))
