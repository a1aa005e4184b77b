"""robots.txt REP operators (operators/robots.py).

Ground truth is hand-written from RFC 9309 and the published REP
matching examples (longest-match, tie→allow, * wildcard, $ anchor) plus
an INDEPENDENT pure-Python matcher (re-based, not LIKE-based) for the
filter stage — the parse grammar and the match arithmetic are each
checked against something that is not themselves.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mistral_ocr_spark.operators.robots import (
    filter_disallowed,
    parse_robots,
    parse_robots_text,
)


def ref_match(path: str, pattern: str) -> bool:
    """Independent REP pattern matcher: regex translation, not LIKE."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    if anchored:
        rx += "$"
    return re.match(rx, path) is not None


def ref_allowed(path: str, rules: list[tuple[bool, str]]) -> bool:
    """RFC longest-match: longest (in OCTETS) matching pattern wins,
    ties → allow."""
    best = None
    for allow, pat in rules:
        if ref_match(path, pat):
            cand = (len(pat.encode("utf-8")), allow)
            if best is None or cand > best:
                best = cand
    return True if best is None else best[1]


# --------------------------------------------------------------------------
# grammar (parse_robots_text)
# --------------------------------------------------------------------------

_BASIC = """
# corpus crawler policy
User-agent: examplebot
Disallow: /private/
Allow: /private/press/

User-agent: otherbot
User-agent: thirdbot
Disallow: /shared/

User-agent: *
Disallow: /tmp/
"""


def test_grammar_group_selection():
    assert parse_robots_text(_BASIC, "ExampleBot") == [
        (False, "/private/"), (True, "/private/press/"),
    ]
    # consecutive UA lines share one group
    assert parse_robots_text(_BASIC, "otherbot") == [(False, "/shared/")]
    assert parse_robots_text(_BASIC, "THIRDBOT") == [(False, "/shared/")]
    # no specific group -> the * group
    assert parse_robots_text(_BASIC, "strangerbot") == [(False, "/tmp/")]


def test_grammar_blank_lines_do_not_split_groups():
    # RFC 9309: blank lines are ignored, so consecutive UA lines merge
    # into ONE group even across a blank line — both get the rules
    txt = "User-agent: nicebot\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots_text(txt, "nicebot") == [(False, "/")]
    assert parse_robots_text(txt, "rude") == [(False, "/")]


def test_grammar_empty_group_at_eof_shadows_star():
    # a UA group with no rules (only possible at EOF or right before the
    # next group's UA lines merge it) means "all allowed" for that agent
    # and must NOT fall through to *
    txt = "User-agent: *\nDisallow: /\nUser-agent: nicebot\n"
    assert parse_robots_text(txt, "nicebot") == []
    assert parse_robots_text(txt, "rude") == [(False, "/")]


def test_grammar_edges():
    # rules before any UA line are invalid -> ignored
    assert parse_robots_text("Disallow: /x\nUser-agent: *\nDisallow: /y\n", "a") == [
        (False, "/y")
    ]
    # a UA line AFTER rules starts a NEW group
    txt = "User-agent: a\nDisallow: /1\nUser-agent: b\nDisallow: /2\n"
    assert parse_robots_text(txt, "a") == [(False, "/1")]
    assert parse_robots_text(txt, "b") == [(False, "/2")]
    # empty Disallow: carries no restriction; comments + CRLF + case
    txt2 = "USER-AGENT: *\r\nDISALLOW:\r\nallow: /ok # trailing comment\r\n"
    assert parse_robots_text(txt2, "x") == [(True, "/ok")]
    assert parse_robots_text("", "x") == []


# --------------------------------------------------------------------------
# matching (the published REP examples, decided through Spark)
# --------------------------------------------------------------------------

_MATCH_CASES = [
    # (rules, path, expected_allowed)  — hand-derived from the RFC/REP docs
    ([(True, "/p"), (False, "/")], "/page", True),          # longest wins
    ([(True, "/folder/"), (False, "/folder")], "/folder/page", True),
    ([(True, "/page"), (False, "/*.ph")], "/page.php5", True),   # tie -> allow
    ([(True, "/page"), (False, "/*.htm")], "/page.htm", False),  # longer disallow
    ([(True, "/$"), (False, "/")], "/", True),               # $ anchor
    ([(True, "/$"), (False, "/")], "/page", False),
    ([(False, "/fish*.php")], "/fish/salmon.php?id=2", False),  # * + query
    ([(False, "/fish*.php")], "/fishing", True),
    ([(False, "/*.gif$")], "/a/b.gif", False),
    ([(False, "/*.gif$")], "/a/b.gif?x=1", True),            # anchor blocks query
    ([(False, "/100%_true")], "/100%_true/x", False),        # literal % and _
    ([(False, "/100%_true")], "/100x_true/x", True),         # _ is not a wildcard
    ([], "/anything", True),                                  # no rules
]


def test_matching_cases_via_spark(spark):
    rows = []
    for i, (rules, path, _want) in enumerate(_MATCH_CASES):
        for allow, pat in rules:
            rows.append((f"h{i}.example", allow, pat))
    txts = [
        (f"h{i}.example", "User-agent: *\n" + "".join(
            f"{'Allow' if a else 'Disallow'}: {p}\n" for a, p in rules))
        for i, (rules, _p, _w) in enumerate(_MATCH_CASES)
    ]
    robots = spark.createDataFrame(txts, "host string, robots_txt string")
    rules_df = parse_robots(robots, user_agent="testbot")
    pages = spark.createDataFrame(
        [(f"https://h{i}.example{path}", i)
         for i, (_r, path, _w) in enumerate(_MATCH_CASES)],
        "url string, case_id int",
    )
    kept = {r.case_id for r in filter_disallowed(pages, rules_df).collect()}
    for i, (rules, path, want) in enumerate(_MATCH_CASES):
        assert (i in kept) == want, f"case {i}: rules={rules} path={path}"
        assert ref_allowed(path, rules) == want  # the independent matcher agrees


def test_filter_matches_independent_matcher_on_fuzz(spark):
    """Randomized rule sets: Spark's LIKE-translated longest-match must
    equal the regex-based reference decision for every page."""
    import random

    rnd = random.Random(20260817)
    frags = ["/a", "/b/", "c", "*", "x.php", "$", "/d-e", "%", "_", "*.gif"]
    hosts, pages_rows, expect = [], [], {}
    for h in range(25):
        host = f"f{h}.example"
        rules = []
        for _ in range(rnd.randint(0, 5)):
            pat = "/" + "".join(rnd.choice(frags) for _ in range(rnd.randint(1, 3))).lstrip("/")
            # $ is only an anchor at the end; keep generated ones legal
            pat = pat.replace("$", "") + ("$" if rnd.random() < 0.3 else "")
            if pat in ("", "$"):
                continue
            rules.append((rnd.random() < 0.5, pat))
        txt = "User-agent: *\n" + "".join(
            f"{'Allow' if a else 'Disallow'}: {p}\n" for a, p in rules)
        hosts.append((host, txt))
        for k in range(6):
            path = "/" + "".join(rnd.choice(["a", "b/", "c", "x.php", "d-e", "%", "_", ".gif"])
                                 for _ in range(rnd.randint(0, 4)))
            url = f"https://{host}{path}" + (f"?q={k}" if rnd.random() < 0.3 else "")
            full_path = url.split(host, 1)[1] or "/"
            pages_rows.append((url,))
            expect[url] = ref_allowed(full_path, rules)
    robots = spark.createDataFrame(hosts, "host string, robots_txt string")
    pages = spark.createDataFrame(pages_rows, "url string")
    kept = {r.url for r in filter_disallowed(pages, parse_robots(robots)).collect()}
    for url, want in expect.items():
        assert (url in kept) == want, f"{url}: want allowed={want}"


def test_grammar_bom_stripped():
    # BOM-prefixed robots.txt must not lose its first group (review)
    txt = "\ufeffUser-agent: *\nDisallow: /\n"
    assert parse_robots_text(txt, "anybot") == [(False, "/")]


def test_empty_path_query_url_matches_as_root(spark):
    # RFC 9309 §2.2.2: empty path is '/', so https://h?x=1 matches '/?x=1'
    # — it must not evade /-prefixed rules (review)
    robots = spark.createDataFrame(
        [("known.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [("https://known.example?x=1", 1), ("https://known.example", 2)],
        "url string, k int",
    )
    kept = {r.k for r in filter_disallowed(pages, parse_robots(robots)).collect()}
    assert kept == set()


def test_mixed_case_robots_host_still_applies(spark):
    # parse_robots lowercases the host to meet url_host's join key (review)
    robots = spark.createDataFrame(
        [("Mixed.Example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [("https://mixed.example/a", 1)], "url string, k int"
    )
    assert filter_disallowed(pages, parse_robots(robots)).count() == 0


def test_specificity_is_octets_not_chars(spark):
    # '/éé' = 5 octets beats '/é*' = 4 octets; a char-count tie would
    # flip the winner to Allow (review)
    rules = [(False, "/éé"), (True, "/é*")]
    assert ref_allowed("/éé", rules) is False
    robots = spark.createDataFrame(
        [("o.example", "User-agent: *\nDisallow: /éé\nAllow: /é*\n")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame([("https://o.example/éé", 1)], "url string, k int")
    assert filter_disallowed(pages, parse_robots(robots)).count() == 0


def test_filter_defaults_and_null_url(spark):
    robots = spark.createDataFrame(
        [("known.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots)
    pages = spark.createDataFrame(
        [("https://known.example/x", 1), ("https://unknown.example/x", 2),
         (None, 3), ("not-a-url", 4)],
        "url string, k int",
    )
    kept = {r.k for r in filter_disallowed(pages, rules).collect()}
    # blocked host dropped; unknown host, NULL url, authority-less url kept
    assert kept == {2, 3, 4}


def test_filter_column_collision_raises(spark):
    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [("https://h.example/x", ["y"])], "url string, _rules array<string>"
    )
    with pytest.raises(ValueError, match="collide"):
        filter_disallowed(pages, parse_robots(robots))


def test_binary_robots_and_parallelism_determinism(spark):
    robots_rows = [(f"h{i}.example",
                    f"User-agent: *\nDisallow: /blocked{i}/\n".encode())
                   for i in range(40)]
    robots = spark.createDataFrame(robots_rows, "host string, robots_txt binary")
    pages = spark.createDataFrame(
        [(f"https://h{i}.example/blocked{i}/p", i) for i in range(40)]
        + [(f"https://h{i}.example/open/p", 100 + i) for i in range(40)],
        "url string, k int",
    )
    outs = []
    for p in (2, 16):
        rules = parse_robots(robots.repartition(p))
        outs.append(sorted(
            r.k for r in filter_disallowed(pages.repartition(p), rules).collect()
        ))
    assert outs[0] == outs[1] == sorted(range(100, 140))
