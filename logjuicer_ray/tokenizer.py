"""LogJuicer-compatible log-line tokenizer.

A from-scratch Python implementation of the normalization semantics of the
reference tokenizer (reference: crates/tokenizer/src/tokenizer.rs:45-608).
The goal is to replace varying words (timestamps, UUIDs, hashes, IPs, base64,
tmp paths, ...) with fixed tokens such as ``%ID`` / ``%HASH`` so that log lines
that differ only in random material produce identical token strings.

The public entry point is :func:`process`.  It is a pure function: one raw log
line in, one token string out.  Inside Ray pipelines it is applied per batch
(see ``logjuicer_ray.stages.tokenize``) — this module stays engine-agnostic.

All regexes are compiled once at module import (the reference uses
``lazy_static`` for the same reason, tokenizer.rs:46-48).
"""

from __future__ import annotations

import re

from .cache import GenCache
import sys

# Recursive word splitting can nest once per '/'-separated path segment
# (tokenizer.rs:543-547); deep paths in 6000-byte lines need headroom.
if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)

__all__ = ["process", "unordered_key", "GL_FILTER"]

GL_FILTER = "%GL_FILTER"

# --- word splitting (tokenizer.rs:45-50) -----------------------------------
# Split on runs of space/tab or literal "\n" / "\r" escape sequences.
_WORDS_RE = re.compile(r"(?:[ \t]|\\[nr])+")

# --- global line filter (tokenizer.rs:64-90) -------------------------------
_GLOBAL_FILTER_RE = re.compile(
    r"GET / HTTP/1.1"
    # yum mirrors information
    r"|\* [a-zA-Z]+: [a-zA-Z0-9\.-]*$|Trying other mirror."
    # useless debug statement
    r"|ovs-ofctl .* (dump-ports|dump-flows|show)\b"
    r"|(ip|eb)tables .* -L\b"
    # chrony logs
    r"|(^\^[+*-] [a-z0-9\.>-]{5,} [0-9])"
    # dnsmasq
    r"|dnsmasq(\[[0-9]+\])?: (query|forwarded|reply|cached|config)"
    # memcached logs
    r"|(^[a-f0-9s/]+>[0-9]+ )"
    # shell debugs
    r"|(^\+\+ echo [^ ]+$)"
    # sysctl taps
    r"|(^net.ipv[46].(conf|neigh).tap)"
    r'|(^[" \t]*net.interface.tap)'
    # key's randomart
    r"|([ '\",]*\|.{17}\|[ '\",]*$)"
)

_WHITESPACE_RE = re.compile(r"\s")


def _global_filter(line: str) -> bool:
    # single-word lines carry no signal (tokenizer.rs:88)
    is_single_word = _WHITESPACE_RE.search(line) is None
    return is_single_word or _GLOBAL_FILTER_RE.search(line) is not None


# --- word classifiers ------------------------------------------------------

# tokenizer.rs:117-123
_NUMBERS_RE = re.compile(r"([0-9]+\.[0-9]+)|([0-9]+)")


def _remove_numbers(word: str) -> str:
    return _NUMBERS_RE.sub("N", word)


# tokenizer.rs:130-142 — the reference regex is a finite anchored
# case-insensitive alternation; a frozenset lookup is semantically identical
# and ~10x faster on the per-unique-word hot path
_DATE_WORDS = frozenset(
    ["sunday", "monday", "tuesday", "wednesday", "thursday", "friday",
     "saturday", "january", "february", "march", "april", "may", "june",
     "july", "august", "september", "october", "november", "december",
     "month", "months", "weed", "weeds", "day", "days", "hour", "hours",
     "minute", "minutes"]
)


def _is_date(word: str) -> bool:
    return word.lower() in _DATE_WORDS

# tokenizer.rs:152-166
_ERROR_WORDS = frozenset(
    ["error", "fatal", "failure", "failed", "warning", "err", "fail",
     "warn", "denied", "assert", "assertion", "non-zero", "exception",
     "traceback"]
)


def _is_error_word(word: str) -> bool:
    return word.lower() in _ERROR_WORDS

# tokenizer.rs:169-174
_ODD_CHAR_RE = re.compile(r"[<>{}%$,*]")

# is_lowercase_vowel includes 'y' (index_name.rs:36-38); consonants are
# b..d f..h j..n p..t v..x z (tokenizer.rs:181-183).
_VOWELS = frozenset("aeiouy")
_CONSONANTS = frozenset("bcdfghjklmnpqrstvwxz")


_VOWELS_CI = frozenset("aeiouyAEIOUY")
_CONSONANTS_CI = frozenset("bcdfghjklmnpqrstvwxzBCDFGHJKLMNPQRSTVWXZ")


def _contains_no_vowel(word: str) -> bool:
    # tokenizer.rs:185-195: no vowel (incl. y) and at least one consonant;
    # case-insensitive via dual-case sets (no lower() allocation)
    found = False
    for c in word:
        if c in _VOWELS_CI:
            return False
        if c in _CONSONANTS_CI:
            found = True
    return found


# tokenizer.rs:198-210 — the reference regex
#   ^(:*[\[\]0-9a-fA-FxZ,]+[:.-]*|(latest|none)|rabbitmq-cluster-id-.*)+$
# has nested quantifiers; a literal Python port backtracks exponentially on
# long near-miss words, so we implement the equivalent linear-time scanner.
_UID_CHARS = frozenset("[]0123456789abcdefABCDEFxZ,")
_UID_SEPS = frozenset(":.-")


def _uid_regex_match(word: str) -> bool:
    # Linear-time scan equivalent to the reference alternation: the ':*'
    # prefix and '[:.-]*' suffix belong to the hex-class branch ONLY —
    # 'latest'/'none' take no separators, so 'latest-abc' does NOT match
    # (the '-' can only be consumed by a following hex-class iteration,
    # which requires at least one hex char it doesn't get).
    i, n = 0, len(word)
    matched = False
    while i < n:
        c0 = word[i]
        # the literal branches can only start with 'r'/'l'/'n' — skip three
        # startswith probes per hex-class iteration otherwise
        if c0 == "r" and word.startswith("rabbitmq-cluster-id-", i):
            return True  # the reference branch ends with .* consuming the rest
        if c0 == "l" and word.startswith("latest", i):
            i += 6
            matched = True
            continue
        if c0 == "n" and word.startswith("none", i):
            i += 4
            matched = True
            continue
        j = i
        while j < n and word[j] == ":":
            j += 1
        if j >= n or word[j] not in _UID_CHARS:
            return False
        while j < n and word[j] in _UID_CHARS:
            j += 1
        while j < n and word[j] in _UID_SEPS:
            j += 1
        i = j
        matched = True
    return matched


def _is_uid(word: str) -> bool:
    return _uid_regex_match(word) or _contains_no_vowel(word)


# tokenizer.rs:224-234 — 3 x 4-char groups separated by '-', trailing '-'
_UUID_RE = re.compile(
    r"^[a-zA-Z0-9].*-[a-zA-Z0-9]{4}-[a-zA-Z0-9]{4}-[a-zA-Z0-9]{4}-$"
)

# tokenizer.rs:237-242
_MANY_DASH_RE = re.compile(r"^.+-.+-.+-.")

# tokenizer.rs:244-250
_COOKIE_RE = re.compile(r"^(gAAAA|AAAA|tx[a-z]|tap|req-|AUTH_)")

# tokenizer.rs:252-258
_URL_RE = re.compile(r"^(https|http|ftp|ssh)://", re.IGNORECASE)

# tokenizer.rs:260-265
_BASE64_RE = re.compile(r"^[A-Za-z0-9+/=]+$")


def _is_base64(word: str) -> bool:
    return word.endswith("==") or (
        len(word) > 24
        and (word.endswith("=") or _BASE64_RE.match(word) is not None)
    )


# tokenizer.rs:267-272
_SYSTEMD_UNIT_RE = re.compile(r"^[a-z]+_[a-z]+\[[0-9]+\]:$")

# tokenizer.rs:292-304 — (hash|sha|md)N[:~] prefix, or a 64-char token run
_HASH_PREFIX_RE = re.compile(r"^(hash|sha|md)[0-9]*[:~]", re.IGNORECASE)
_HASH_RUN_RE = re.compile(r"[a-zA-Z0-9_+/-]{64}")


def _is_hash(word: str) -> bool:
    return not word.startswith("/") and (
        _HASH_PREFIX_RE.search(word) is not None
        or (len(word) >= 64 and _HASH_RUN_RE.search(word) is not None)
    )


# tokenizer.rs:321-326
_REFS_RE = re.compile(r"^\w{7}\.\.\w{7}$")


def _is_refs(word: str) -> bool:
    return (
        word.startswith("refs/")
        or word.startswith("repos/")
        or (len(word) == 16 and word[7:9] == ".." and _REFS_RE.match(word) is not None)
    )


def _split_once(word: str, chars: str) -> tuple[str, str] | None:
    """Rust ``str::split_once([c, ...])``: split at the first occurrence of
    any of the given characters."""
    best = -1
    for c in chars:
        i = word.find(c)
        if i != -1 and (best == -1 or i < best):
            best = i
    if best == -1:
        return None
    return word[:best], word[best + 1 :]


def _is_key_value(word: str) -> tuple[str, str] | None:
    # tokenizer.rs:328-339: split at first '=' or ':'; key must start with
    # a letter or underscore.
    kv = _split_once(word, "=:")
    if kv is None:
        return None
    k, v = kv
    if k and (k[0].isascii() and (k[0].isalpha() or k[0] == "_")):
        return k, v
    return None


def _is_two_words(word: str) -> tuple[str, str] | None:
    # tokenizer.rs:345-349: separate attached words like DHCPOFFER(ipaddr)
    kv = _split_once(word, "[(\\@")
    if kv is None:
        return None
    k, v = kv
    return k, v.rstrip("])")


# tokenizer.rs:351-361
_KEY_FOR_ID_RE = re.compile(
    r"(id|key|ref|region|token|secret|password|pipeline)", re.IGNORECASE
)


def _is_password_key(word: str) -> bool:
    # tokenizer.rs:363-365
    return word.endswith("password:") or word.endswith("password=")


def _is_random_path(word: str) -> bool:
    # tokenizer.rs:367-369
    return "tmp/" in word or "/tmp" in word or word.startswith("tmp")


_TRIM_CHARS = "'\",;()[]{}<>\\"


def _trim_quote_and_punctuation(word: str) -> str:
    # tokenizer.rs:52-61
    if word[:1] == "u":
        while word.startswith('u"'):
            word = word[2:]
        while word.startswith("u'"):
            word = word[2:]
    return word.strip(_TRIM_CHARS)


# _parse_literal is a pure function of the word and dominates tokenizer
# time (10 classifier probes per word); words repeat heavily across lines,
# so memoize (capped — random-material words are unbounded)
_LITERAL_CACHE = GenCache(500_000)
_MISS = object()


def _parse_literal(word: str) -> str | None:
    # inlined two-generation lookup: this is the hottest call site and a
    # method call per probe measured ~4x the cost of the dict get itself
    c = _LITERAL_CACHE
    v = c.live.get(word, _MISS)
    if v is not _MISS:
        return v
    v = c.old.get(word, _MISS)
    if v is _MISS:
        v = _parse_literal_uncached(word)
    c[word] = v
    return v


def _parse_literal_uncached(word: str) -> str | None:
    # tokenizer.rs:455-480 — most specific first
    if _is_date(word):
        return "%DATE"
    if _is_hash(word):
        return "%HASH"
    if _is_uid(word):
        return "%ID"
    if _COOKIE_RE.match(word):
        return "%COOKIE"
    # guards mirror structural requirements of the anchored regexes
    # (trailing '-', '://' prefix, ']:'' suffix) — pure short-circuits
    if word.endswith("-") and _UUID_RE.match(word):
        return "%UID"
    if "//" in word[:9] and _URL_RE.match(word):
        return "%URL"
    if _is_random_path(word):
        return "%PATH"
    if _is_refs(word):
        return "%REF"
    if _is_base64(word):
        return "%BASE64"
    if word.endswith("]:") and _SYSTEMD_UNIT_RE.match(word):
        # systemd units are often random because of containers
        return "%UNIT"
    return None


def _trim_pid(word: str) -> str | None:
    # tokenizer.rs:482-485: "systemd[42" -> "systemd"
    stripped = word.rstrip("0123456789")
    if stripped.endswith("["):
        return stripped[:-1]
    return None


def _push_error(word: str, result: list[str]) -> None:
    # tokenizer.rs:488-496: amplify error words 5x
    result.append(word)
    result.append(" ")
    result.append(word)
    result.append("%A ")
    result.append(word)
    result.append("%B ")
    result.append(word)
    result.append("%C ")
    result.append(word)
    result.append("%D")


class _WordIter:
    """Mutable cursor over the split words; ``do_process`` may consume the
    next word (key=value with secret key, password: suffix —
    tokenizer.rs:533-539,574-577)."""

    __slots__ = ("words", "i")

    def __init__(self, words: list[str]):
        self.words = words
        self.i = 0

    def next(self) -> str | None:
        if self.i >= len(self.words):
            return None
        w = self.words[self.i]
        self.i += 1
        return w


def _do_process(base_word: str, it: _WordIter, result: list[str]) -> bool:
    # tokenizer.rs:507-585 — most specific to most general
    word = _trim_quote_and_punctuation(base_word)
    added = True
    if not word:
        added = False
    elif (token := _parse_literal(word)) is not None:
        result.append(token)
    elif _is_error_word(word):
        _push_error(word, result)
    elif len(word) <= 3:
        added = False
    elif (strip := _trim_pid(word)) is not None:
        _do_process(strip, it, result)
        result.append("%PID")
    elif _ODD_CHAR_RE.search(word):
        result.append("%ODD")
    elif (kv := _is_key_value(word)) is not None:
        key, value = kv
        _do_process(key, it, result)
        if _KEY_FOR_ID_RE.search(key):
            if not value:
                it.next()  # consume the next word
            result.append("%EQ %VALUE_ID")
        else:
            result.append("%EQ ")
            added = _do_process(value, it, result)
    elif "/" in word:
        w1, w2 = word.split("/", 1)
        if _do_process(w1, it, result):
            result.append("/ ")
        added = _do_process(w2, it, result)
    elif "-" in word:
        w1, w2 = word.split("-", 1)
        if _MANY_DASH_RE.match(w2):
            # >4 dashes is noise (heat uids) — tokenizer.rs:548-553
            result.append("%DASH")
        else:
            if _do_process(w1, it, result):
                result.append("- ")
            added = _do_process(w2, it, result)
    elif "|" in word:
        w1, w2 = word.split("|", 1)
        if _do_process(w1, it, result):
            result.append("| ")
        added = _do_process(w2, it, result)
    elif len(word) >= 32:
        result.append("%BIG")
    elif (tw := _is_two_words(word)) is not None:
        w1, w2 = tw
        if _do_process(w1, it, result):
            result.append(" ")
        added = _do_process(w2, it, result)
    else:
        x = _remove_numbers(word)
        if _is_password_key(x):
            it.next()  # consume the next word (the secret)
            result.append(x)
        elif len(x) > 3:
            result.append(x)
        else:
            added = False
    return added


class _CountingIter:
    """Stands in for the word iterator inside the per-word memo: both
    consuming branches (secret key=, password: — tokenizer.rs:533-539,
    574-577) discard the consumed word's value, so recording the count fully
    captures the side effect."""

    __slots__ = ("consumed",)

    def __init__(self) -> None:
        self.consumed = 0

    def next(self) -> None:
        self.consumed += 1
        return None


# Per-word memo: a word's emitted fragment, its `added` flag and how many
# following words it consumes are all pure functions of the word itself.
_WORD_CACHE = GenCache(500_000)


def _word_process(word: str) -> tuple[str, bool, int]:
    c = _WORD_CACHE
    hit = c.live.get(word)
    if hit is None:
        hit = c.old.get(word)
        if hit is not None:
            c[word] = hit  # promote
    if hit is None:
        buf: list[str] = []
        it = _CountingIter()
        added = _do_process(word, it, buf)
        hit = ("".join(buf), added, it.consumed)
        c[word] = hit
    return hit


def process(line: str) -> str:
    """Tokenize one raw log line (tokenizer.rs:588-608).

    >>> process("sha256://toto tata finished in 28ms by systemd[4248]")
    '%HASH tata finished %ID systemd%PID'
    """
    line = line.strip()
    if _global_filter(line):
        return GL_FILTER
    return _process_words(line)


def _process_words(line: str) -> str:
    """``process()`` minus strip + global filter — the per-line body for
    callers that already ran the filter vectorized over a whole unique-line
    array (stages/tokenize.py); ``line`` must be pre-stripped."""
    result: list[str] = []
    words = _WORDS_RE.split(line)
    i = 0
    n = len(words)
    while i < n:
        frag, added, consumed = _word_process(words[i])
        i += 1 + consumed
        if frag:
            result.append(frag)
        if added:
            result.append(" ")
    return "".join(result).rstrip()


def unordered_key(tokens: str) -> str:
    """Order-insensitive dedup key over a token string.

    Mirrors the reference ``KnownLines`` bag: split on spaces, drop
    ``%``-prefixed tokens, sort (crates/model/src/unordered.rs:9-44), so that
    ``"first line"`` and ``"line first"`` collide.
    """
    return " ".join(sorted(w for w in tokens.split(" ") if not w.startswith("%")))
