"""robots.txt (RFC 9309) lane tests: the columnar Spark parse +
longest-match evaluation vs the sequential reference implementation,
on spec examples and randomized crawls."""

from __future__ import annotations

import random

from evm_archive_spark.parity.queries import robots_reference_allowed


def test_reference_spec_cases():
    """RFC 9309 §2.2.2 / §5 behaviors pinned on the reference itself."""
    txt = (
        "User-agent: corpusbot\n"
        "Disallow: /private/\n"
        "Allow: /private/public-*.html$\n"
    )
    ok = lambda p: robots_reference_allowed(txt, "CorpusBot", p)  # noqa: E731
    assert ok("/open")                       # no rule matches -> allowed
    assert not ok("/private/x")              # disallow prefix
    assert ok("/private/public-1.html")      # longer allow wins
    assert not ok("/private/public-1.html?") # $ anchor: no tail allowed
    assert not ok("/private/public-1.htmlx") # $ anchor strict

    # tie on length: Allow wins
    tie = "User-agent: *\nDisallow: /\nAllow: /\n"
    assert robots_reference_allowed(tie, "anybot", "/x")

    # exact group beats * group entirely (rules do NOT merge)
    grouped = (
        "User-agent: *\nDisallow: /\n"
        "User-agent: corpusbot\nDisallow: /only-this\n"
    )
    assert robots_reference_allowed(grouped, "CorpusBot", "/anything")
    assert not robots_reference_allowed(grouped, "CorpusBot", "/only-this")
    assert not robots_reference_allowed(grouped, "strangerbot", "/anything")

    # multi-UA block shares rules; noise fields split blocks
    multi = (
        "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        "Crawl-delay: 5\nUser-agent: c\nDisallow: /y\n"
    )
    assert not robots_reference_allowed(multi, "b", "/x")
    assert robots_reference_allowed(multi, "c", "/x")
    assert not robots_reference_allowed(multi, "c", "/y")

    # rules before any group are ignored; comments stripped
    orphan = "Disallow: /all\n# User-agent: *\nUser-agent: *\nAllow: /\n"
    assert robots_reference_allowed(orphan, "x", "/all")

    # empty / missing robots -> allowed
    assert robots_reference_allowed("", "x", "/anything")

    # empty Disallow value is a no-op, wildcard patterns work
    wild = "User-agent: *\nDisallow:\nDisallow: /*.json\n"
    assert robots_reference_allowed(wild, "x", "/a")
    assert not robots_reference_allowed(wild, "x", "/deep/a.json")


def _random_fixture(rng: random.Random):
    """Randomized robots.txt + paths over a small shared alphabet so
    rules and URLs actually collide."""
    segs = ["a", "b", "c", "x.json", "img", "p-1.html", "deep"]
    agents = ["corpusbot", "otherbot", "*"]

    def rand_pattern():
        p = "/" + "/".join(
            rng.choice(segs) for _ in range(rng.randint(1, 2))
        )
        if rng.random() < 0.3:
            i = rng.randint(1, len(p))
            p = p[:i] + "*" + p[i:]
        if rng.random() < 0.25:
            p += "$"
        return p

    lines = []
    for _ in range(rng.randint(1, 4)):          # groups
        for _ in range(rng.randint(1, 2)):      # UA lines per group
            lines.append(f"User-agent: {rng.choice(agents)}")
        for _ in range(rng.randint(0, 4)):      # rules per group
            kind = rng.choice(["Allow", "Disallow"])
            lines.append(f"{kind}: {rand_pattern()}")
        if rng.random() < 0.3:
            lines.append("Crawl-delay: 3")
        if rng.random() < 0.3:
            lines.append("# a comment")
    txt = "\n".join(lines)
    paths = [
        "/" + "/".join(rng.choice(segs) for _ in range(rng.randint(1, 3)))
        for _ in range(12)
    ]
    return txt, paths


def _pooled_robots_spark_matches_reference_fuzz(spark):
    """The whole Spark lane (parse_robots_rules + robots_decisions)
    against the sequential reference over 40 randomized hosts x 12
    paths, both agents — every decision must agree."""
    from evm_archive_spark.operators.robots import (
        parse_robots_rules,
        robots_decisions,
    )

    rng = random.Random(20260814)
    robots_rows, page_rows, expected = [], [], {}
    pid = 0
    for h in range(40):
        host = f"h{h}.example"
        txt, paths = _random_fixture(rng)
        robots_rows.append((host, txt))
        for p in paths:
            url = f"http://{host}{p}"
            page_rows.append((pid, url))
            expected[pid] = robots_reference_allowed(txt, "CorpusBot", p)
            pid += 1
    # a host with pages but no robots row: default allowed
    for p in ("/a", "/x.json"):
        page_rows.append((pid, f"http://norobots.example{p}"))
        expected[pid] = True
        pid += 1

    robots = spark.createDataFrame(
        robots_rows, "host string, robots_txt string"
    )
    pages = spark.createDataFrame(page_rows, "page_id long, url string")
    rules = parse_robots_rules(robots)
    got = {
        r["page_id"]: r["allowed"]
        for r in robots_decisions(pages, rules, "CorpusBot").collect()
    }
    assert len(got) == len(expected)
    diffs = {k for k in expected if got[k] != expected[k]}
    assert not diffs, sorted(diffs)[:10]

    # duplicate page rows survive (one decision per input ROW)
    dup = spark.createDataFrame(
        [(99, "http://h0.example/a")] * 3, "page_id long, url string"
    )
    assert robots_decisions(dup, rules, "CorpusBot").count() == 3
