"""Tag-DSL compiler: pbf2json's ``-tags`` grammar → a Spark ``Column`` predicate.

Grammar (reference: getSettings, pbf2json.go:187-218):

  query     := group (',' group)*            -- OR of groups
  group     := selector ('§' selector)*      -- AND of selectors
  selector  := alt ('!' alt)*                -- OR of tag alternatives
  alt       := name ['~' valuedef]
  name      := literal-key | text '#' key-regex    -- regex = after LAST '#'
  valuedef  := value (';' value)* | text '#' value-regex

Semantics (testTagVal pbf2json.go:1002-1013, matchTagsAgainstCompulsoryTagList
1017-1043, containsValidTags 1046-1056): a selector is satisfied iff some
(key, value) pair in the (trimmed) tag map satisfies one of its alternatives;
a row matches iff its tag map is non-empty and at least one group has all of
its selectors satisfied. Regexes are *search* (substring) matches, like Go's
``MatchString`` and Spark's ``rlike``.

Divergence (documented, SURVEY.md §5.3): the fork uses '§' as the AND
delimiter while its own tests/README use upstream's '+'; we accept both.

Everything compiles to JVM-side Column expressions (``map_contains_key``,
``element_at().isin/rlike``, ``exists(map_entries(...))``) — no Python UDFs,
so Catalyst keeps the predicate inside WholeStageCodegen and, for top-level
columns, can push it toward the scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

AND_DELIMS = ("§", "+")


@dataclass
class TagValue:
    """Predicate on a tag *value* (reference TagValue, pbf2json.go:31-35)."""

    any: bool = False
    values: frozenset[str] = field(default_factory=frozenset)
    regex: str | None = None

    def eval(self, val: str) -> bool:
        if self.any:
            return True
        if val in self.values:
            return True
        if self.regex is not None:
            return re.search(self.regex, val) is not None
        return False

    def column(self, val: Column) -> Column:
        if self.any:
            return F.lit(True)
        if self.regex is not None:
            return val.rlike(self.regex)
        return val.isin(*self.values) if self.values else F.lit(False)


@dataclass
class Alt:
    """One tag alternative: literal key or key-regex, plus a TagValue."""

    key: str | None  # literal key (None if key_regex)
    key_regex: str | None
    value: TagValue


@dataclass
class Selector:
    """One AND-term: OR of alternatives (reference TagSelector)."""

    alts: list[Alt]


Query = list[list[Selector]]  # OR over groups of AND-ed selectors


def parse(tags_dsl: str) -> Query:
    """Parse the DSL string. Mirrors pbf2json.go:187-218 exactly, including
    the quirks: value-regex and key-regex take the text after the LAST '#'
    and discard what precedes it; extra '~' parts are dropped."""
    if not tags_dsl:
        raise ValueError("empty tags DSL: nothing to match against")
    groups: Query = []
    for group in tags_dsl.split(","):
        selectors: list[Selector] = []
        for cond in _split_and(group):
            alts: list[Alt] = []
            for tag in cond.split("!"):
                pair = tag.split("~")
                tv = TagValue()
                if len(pair) > 1:
                    valuedef = pair[1]
                    p1 = valuedef.rfind("#")
                    if p1 >= 0:
                        tv.regex = valuedef[p1 + 1 :]
                    else:
                        tv.values = frozenset(valuedef.split(";"))
                else:
                    tv.any = True
                tname = pair[0]
                pos = tname.rfind("#")
                if pos >= 0:
                    alts.append(Alt(key=None, key_regex=tname[pos + 1 :], value=tv))
                else:
                    alts.append(Alt(key=tname, key_regex=None, value=tv))
            selectors.append(Selector(alts))
        groups.append(selectors)
    return groups


def _split_and(group: str) -> list[str]:
    parts = [group]
    for d in AND_DELIMS:
        parts = [p for part in parts for p in part.split(d)]
    return parts


# --- Column compilation ------------------------------------------------------


def selector_column(sel: Selector, tags: Column) -> Column:
    """True iff some (k,v) in `tags` satisfies one of the selector's alts."""
    cols: list[Column] = []
    for alt in sel.alts:
        if alt.key is not None:
            if alt.value.any:
                cols.append(F.map_contains_key(tags, F.lit(alt.key)))
            else:
                cols.append(
                    F.coalesce(
                        alt.value.column(F.element_at(tags, F.lit(alt.key))),
                        F.lit(False),
                    )
                )
        else:
            kre = alt.key_regex
            tv = alt.value
            cols.append(
                F.exists(
                    F.map_entries(tags),
                    lambda e: e["key"].rlike(kre) & tv.column(e["value"]),
                )
            )
    return reduce(lambda a, b: a | b, cols)


def compile_query(query: Query, tags: Column) -> Column:
    """OR over groups of AND-ed selectors + non-empty-tags guard
    (containsValidTags, pbf2json.go:1046-1056). Assumes `tags` already
    trimmed via trim_tags()."""
    group_cols = [
        reduce(lambda a, b: a & b, (selector_column(s, tags) for s in sels))
        for sels in query
    ]
    return (F.size(tags) > 0) & reduce(lambda a, b: a | b, group_cols)


def compile_tags_dsl(tags_dsl: str, tags: Column) -> Column:
    return compile_query(parse(tags_dsl), tags)


def trim_tags(tags: Column) -> Column:
    """Trim whitespace on every key and value; applied before matching AND
    persisted to output (trimTags, pbf2json.go:1277-1283). Duplicate keys
    after trimming resolve last-wins (spark.sql.mapKeyDedupPolicy=LAST_WIN,
    set in session.py, matching Go map overwrite)."""
    return F.transform_values(
        F.transform_keys(tags, lambda k, _: F.trim(k)), lambda _, v: F.trim(v)
    )


def drop_key(tags: Column, key: str) -> Column:
    """map without `key` — the xwayOnly projection (pbf2json.go:1059-1068)."""
    return F.map_filter(tags, lambda k, _: k != F.lit(key))


def xway_only(query: Query, tags: Column, key: str) -> Column:
    """True iff the row is interesting ONLY because of `key`: delete the key
    and re-run the groups (without the hasTags guard — Go's xwayOnly calls
    matchTagsAgainstCompulsoryTagList directly, pbf2json.go:1059-1068)."""
    reduced = drop_key(tags, key)
    group_cols = [
        reduce(lambda a, b: a & b, (selector_column(s, reduced) for s in sels))
        for sels in query
    ]
    return ~reduce(lambda a, b: a | b, group_cols)


# --- Pure-Python evaluator (for property tests vs the Column compiler) -------


def eval_query(query: Query, tags: dict[str, str]) -> bool:
    tags = {k.strip(): v.strip() for k, v in tags.items()}
    if not tags:
        return False
    return any(_eval_group(sels, tags) for sels in query)


def _eval_group(sels: list[Selector], tags: dict[str, str]) -> bool:
    return all(_eval_selector(s, tags) for s in sels)


def _eval_selector(sel: Selector, tags: dict[str, str]) -> bool:
    for k, v in tags.items():
        for alt in sel.alts:
            if alt.key is not None:
                if k == alt.key and alt.value.eval(v):
                    return True
            elif re.search(alt.key_regex, k) and alt.value.eval(v):
                return True
    return False
