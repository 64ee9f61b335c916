"""operators.robots — robots.txt parsing + longest-match policy
(q150 is the oracle twin)."""

from __future__ import annotations

from pyspark.sql import Row

from mb8600_clickhouse_spark.operators.robots import parse_robots, robots_filter

ROBOTS = """# comment
User-agent: specialbot
Disallow: /only-special

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:
Allow: /private/okra-not-really
"""


def _rules(spark, agent="*"):
    df = spark.createDataFrame([Row(host="h1", robots=ROBOTS)])
    return parse_robots(df, agent=agent)


class TestParseRobots:
    def test_star_group_only(self, spark):
        got = {(r["allow"], r["prefix"]) for r in _rules(spark).collect()}
        assert got == {
            (False, "/private"),
            (True, "/private/ok"),
            (True, "/private/okra-not-really"),
        }  # specialbot group excluded; empty Disallow dropped

    def test_named_agent_group_replaces_star(self, spark):
        # RFC 9309: the most specific group WINS — '*' rules are
        # ignored when a group names the agent
        got = {(r["allow"], r["prefix"]) for r in _rules(spark, "SpecialBot").collect()}
        assert got == {(False, "/only-special")}

    def test_rule_value_keeps_colons(self, spark):
        df = spark.createDataFrame(
            [Row(host="h", robots="User-agent: *\nDisallow: /a:b/c")]
        )
        got = [r["prefix"] for r in parse_robots(df).collect()]
        assert got == ["/a:b/c"]

    def test_named_group_with_only_empty_disallow_blocks_star(self, spark):
        # RFC 9309: a group naming the agent whose ONLY rule is the
        # empty-path 'Disallow:' (allow everything) still EXISTS — the
        # '*' group must not apply as a fallback
        txt = (
            "User-agent: specialbot\nDisallow:\n\n"
            "User-agent: *\nDisallow: /\n"
        )
        df = spark.createDataFrame([Row(host="h", robots=txt)])
        assert parse_robots(df, agent="specialbot").collect() == []
        star = {(r["allow"], r["prefix"]) for r in parse_robots(df).collect()}
        assert star == {(False, "/")}


class TestRobotsFilter:
    def test_longest_match_and_default_allow(self, spark):
        urls = spark.createDataFrame(
            [
                Row(doc_id=1, host="h1", path="/public/x"),     # no match
                Row(doc_id=2, host="h1", path="/private/x"),    # disallow
                Row(doc_id=3, host="h1", path="/private/ok/x"), # allow (longer)
                Row(doc_id=4, host="h2", path="/private/x"),    # host w/o rules
            ]
        )
        out = {
            r["doc_id"]: r["crawl_allowed"]
            for r in robots_filter(urls, _rules(spark)).collect()
        }
        assert out == {1: True, 2: False, 3: True, 4: True}

    def test_allow_beats_disallow_at_equal_length(self, spark):
        rules = spark.createDataFrame(
            [Row(host="h", allow=False, prefix="/a/b"),
             Row(host="h", allow=True, prefix="/a/c")]
        )
        # equal-length competing prefixes never both match one path;
        # craft the true tie: same prefix listed as both allow+disallow
        rules = rules.union(
            spark.createDataFrame([Row(host="h", allow=True, prefix="/a/b")])
        )
        urls = spark.createDataFrame([Row(doc_id=1, host="h", path="/a/b/z")])
        out = robots_filter(urls, rules).collect()[0]
        assert out["crawl_allowed"] is True

    def test_wildcard_and_end_anchor(self, spark):
        # Google/RFC 9309 special characters: '*' = any sequence,
        # trailing '$' = end-of-path anchor, mid-rule '$' literal;
        # regex metacharacters in rule paths stay literal
        rules = spark.createDataFrame(
            [
                Row(host="h", allow=False, prefix="/*?"),       # any query
                Row(host="h", allow=False, prefix="/fish$"),    # exact only
                Row(host="h", allow=False, prefix="/a$b"),      # literal $
                Row(host="h", allow=False, prefix="/p(1)"),     # literal ()
                Row(host="h", allow=True, prefix="/shop/*?ok"), # longer allow
            ]
        )
        urls = spark.createDataFrame(
            [
                Row(doc_id=1, host="h", path="/page?x=1"),      # /*? → deny
                Row(doc_id=2, host="h", path="/page"),          # no match
                Row(doc_id=3, host="h", path="/fish"),          # anchored deny
                Row(doc_id=4, host="h", path="/fish/tank"),     # anchor miss
                Row(doc_id=5, host="h", path="/a$b/x"),         # literal $ deny
                Row(doc_id=6, host="h", path="/p(1)/y"),        # literal () deny
                Row(doc_id=7, host="h", path="/shop/x?ok"),     # allow wins (longer)
            ]
        )
        out = {
            r["doc_id"]: r["crawl_allowed"]
            for r in robots_filter(urls, rules).collect()
        }
        assert out == {
            1: False, 2: True, 3: False, 4: True, 5: False, 6: False, 7: True,
        }


class TestRobotsProperty:
    """Property: robots_filter's broadcast longest-match verdict equals
    a direct Python implementation of the RFC 9309 rule (longest
    matching prefix wins, Allow beats Disallow at equal length, no
    match = allowed) over random rule sets and paths."""

    def test_matches_python_reference(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        seg = st.sampled_from(["/a", "/b", "/a/b", "/a/c", "/b/a", "/abc"])
        rule = st.tuples(st.booleans(), seg)

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(
            rules=st.lists(rule, min_size=0, max_size=6),
            paths=st.lists(seg, min_size=1, max_size=5),
        )
        def check(rules, paths):
            rules_df = spark.createDataFrame(
                [Row(host="h", allow=a, prefix=p) for a, p in rules],
                "host string, allow boolean, prefix string",
            )
            urls = spark.createDataFrame(
                [Row(doc_id=i, host="h", path=p + "/x") for i, p in enumerate(paths)]
            )
            got = {
                r["doc_id"]: r["crawl_allowed"]
                for r in robots_filter(urls, rules_df).collect()
            }
            for i, p in enumerate(paths):
                path = p + "/x"
                matches = [(len(pre), al) for al, pre in rules if path.startswith(pre)]
                want = max(matches)[1] if matches else True
                assert got[i] == want, (rules, path, got[i], want)

        check()

    def test_wildcard_rules_match_python_reference(self, spark):
        import re as _re

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        frag = st.sampled_from(["/a", "/b", "/a/b", "?x", "/fish"])
        suffix = st.sampled_from(["", "*", "$", "*?"])
        rule = st.tuples(st.booleans(), frag, suffix)
        path = st.sampled_from(
            ["/a/b/x", "/a?x=1", "/fish", "/fish/tank", "/b?x", "/a/b"]
        )

        def py_match(prefix: str, p: str) -> bool:
            if "*" not in prefix and not prefix.endswith("$"):
                return p.startswith(prefix)
            pat = "^" + _re.escape(prefix).replace(r"\*", ".*")
            if pat.endswith(r"\$"):
                pat = pat[:-2] + "$"
            return _re.search(pat, p) is not None

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(rules=st.lists(rule, min_size=0, max_size=5),
               paths=st.lists(path, min_size=1, max_size=4))
        def check(rules, paths):
            rl = [(a, f + s) for a, f, s in rules]
            rules_df = spark.createDataFrame(
                [Row(host="h", allow=a, prefix=p) for a, p in rl],
                "host string, allow boolean, prefix string",
            )
            urls = spark.createDataFrame(
                [Row(doc_id=i, host="h", path=p) for i, p in enumerate(paths)]
            )
            got = {
                r["doc_id"]: r["crawl_allowed"]
                for r in robots_filter(urls, rules_df).collect()
            }
            for i, p in enumerate(paths):
                matches = [
                    (len(pre), al) for al, pre in rl if py_match(pre, p)
                ]
                want = max(matches)[1] if matches else True
                assert got[i] == want, (rl, p, got[i], want)

        check()
