"""Public Suffix List engine for registrable-domain (eTLD+1) extraction.

Implements the publicsuffix.org matching algorithm over a data file in
the upstream list format, so the bundled curated subset
(``data/public_suffix_list.dat``) can be swapped for the full upstream
list without code changes — the PSL is a *data* dependency and is
injectable (``set_default_psl`` / ``PublicSuffixList.from_file``).

Why it matters here: the politeness scheduler budgets per registrable
domain (SURVEY.md §4.2-1). Naive two-level heuristics collapse every
``*.co.uk``-style host outside a hand list into one budget and split
hosts under wildcard ccTLDs (``*.ck``) wrongly — at Common-Crawl scale
that breaks crawl fairness for whole country zones.

Algorithm (https://publicsuffix.org/list/):
- a rule matches when its labels equal the domain's trailing labels
  (right-to-left); ``*`` matches exactly one label,
- the prevailing rule is the matching exception rule (``!`` prefix) if
  any, else the longest matching rule, else the implicit ``*``,
- public suffix = prevailing rule's labels (minus the leading label for
  an exception rule); registrable domain = suffix plus one more label.
"""

from __future__ import annotations

import os

_DATA_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "public_suffix_list.dat"
)


class PublicSuffixList:
    def __init__(self, rules: list[str]):
        # rules keyed by reversed label tuple for right-to-left matching
        self.exceptions: set[tuple[str, ...]] = set()
        self.rules: set[tuple[str, ...]] = set()
        self.max_labels = 1
        for raw in rules:
            rule = raw.strip().lower()
            if not rule or rule.startswith("//"):
                continue
            if rule.startswith("!"):
                labels = tuple(reversed(rule[1:].split(".")))
                self.exceptions.add(labels)
                self.max_labels = max(self.max_labels, len(labels))
            else:
                labels = tuple(reversed(rule.split(".")))
                self.rules.add(labels)
                self.max_labels = max(self.max_labels, len(labels))

    @classmethod
    def from_file(cls, path: str) -> "PublicSuffixList":
        with open(path, encoding="utf-8") as f:
            return cls(f.readlines())

    # ------------------------------------------------------------------
    def suffix_label_count(self, labels: list[str]) -> int:
        """Number of trailing labels forming the public suffix."""
        rev = list(reversed(labels))
        # exception rules win outright: suffix is the rule minus its
        # leading (leftmost) label
        for n in range(min(len(rev), self.max_labels), 0, -1):
            cand = tuple(rev[:n])
            if cand in self.exceptions:
                return n - 1
        best = 1  # implicit '*' rule: the bare TLD is always a suffix
        for n in range(2, min(len(rev), self.max_labels) + 1):
            cand = tuple(rev[:n])
            wild = tuple(rev[: n - 1]) + ("*",)
            if cand in self.rules or wild in self.rules:
                best = max(best, n)
        return best

    def public_suffix(self, host: str) -> str | None:
        labels = self._labels(host)
        if not labels:
            return None
        return ".".join(labels[-self.suffix_label_count(labels):])

    def registrable_domain(self, host: str) -> str | None:
        """eTLD+1; for a host that IS a public suffix, the host itself
        (graceful degradation — the politeness layer needs *some* key)."""
        labels = self._labels(host)
        if not labels:
            return None
        n = self.suffix_label_count(labels)
        take = min(len(labels), n + 1)
        return ".".join(labels[-take:])

    @staticmethod
    def _labels(host: str) -> list[str]:
        if not host:
            return []
        host = host.lower().rstrip(".")
        if not host:
            return []
        return host.split(".")


_DEFAULT: PublicSuffixList | None = None


def _bundled_rules() -> list[str]:
    try:
        with open(_DATA_FILE, encoding="utf-8") as f:
            return f.readlines()
    except OSError:
        # package imported from a --py-files zip: plain open() can't
        # reach into the archive, importlib.resources can
        from importlib import resources

        return (
            resources.files("crawler_spark")
            .joinpath("data/public_suffix_list.dat")
            .read_text(encoding="utf-8")
            .splitlines()
        )


def default_psl() -> PublicSuffixList:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = PublicSuffixList(_bundled_rules())
    return _DEFAULT


def set_default_psl(psl: PublicSuffixList) -> None:
    """Inject a different list (e.g. the full upstream PSL)."""
    global _DEFAULT
    _DEFAULT = psl
