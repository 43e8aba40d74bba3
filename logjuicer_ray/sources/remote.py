"""Remote CI connectors — httpdir crawl, Zuul build API, Prow job history.

This is the discovery half of the reference's remote protocol support:

- ``crates/httpdir/src/httpdir.rs`` — "Index of" autoindex crawler
  (href regex, "Logs of interest" footer cut, /etc/ /proc/ /sys/ skip,
  visited-set + path-length loop guard, 2500-request cap).
- ``crates/model/src/urls.rs`` — URL dispatch (zuul build page / prow view
  URL / trailing-slash directory / plain file).
- ``crates/model/src/zuul.rs`` + ``crates/zuul/src/*`` — build API decode
  (legacy flat and v10 nested ``ref`` formats), webui/whitelabel API-url
  recovery, inventory.yaml decode, zuul-manifest.json tree walk, and the
  baseline discovery scoring rules.
- ``crates/model/src/prow.rs`` + ``crates/prow/src/prow_build.rs`` — view
  URL parse, Artifacts link extraction, ``var allBuilds = `` job-history
  pagination, first-SUCCESS baseline pick.

All I/O goes through a :class:`Fetcher` so every rule above runs — and is
tested — fully offline against a :class:`LocalMirrorFetcher` directory
tree; :class:`HttpFetcher` is the thin stdlib client for real deployments.

Scale shape: discovery is metadata-plane (a few KiB of JSON/HTML per
build, bounded by ``request_max``) and runs where the query is planned.
The data plane — reading the discovered log files — is
:func:`read_url_lines`: one Ray task per file URL, each fetching only its
own bytes, producing turns-schema rows grouped by the relative path's
IndexName exactly like a local directory scan.
"""

from __future__ import annotations

import io
import json
import os
import posixpath
import re
from dataclasses import dataclass
from datetime import datetime, timezone
from urllib.parse import quote, unquote, urlencode, urljoin, urlparse

__all__ = [
    "RemoteError",
    "LocalMirrorFetcher",
    "HttpFetcher",
    "parse_index_of",
    "httpdir_list",
    "ZuulBuild",
    "decode_zuul_build",
    "decode_zuul_builds",
    "zuul_api_url_from_build_url",
    "zuul_build_from_inventory",
    "zuul_manifest_urls",
    "zuul_baseline_score",
    "zuul_discover_baselines",
    "zuul_sources",
    "ProwBuild",
    "parse_prow_url",
    "prow_artifact_url",
    "parse_prow_job_history",
    "prow_iter_builds",
    "prow_discover_baselines",
    "prow_sources",
    "content_from_url",
    "read_url_lines",
]


class RemoteError(Exception):
    """A remote-content decoding or availability failure."""


# ---------------------------------------------------------------------------
# Fetchers


class LocalMirrorFetcher:
    """Serve ``http(s)://host/path[?query]`` from ``root/host/path`` on disk.

    Lookup order: a literal ``path?query`` file, then the plain path; a
    directory resolves to its ``index.html`` if present, else a synthetic
    "Index of" autoindex page is generated (dirs get a trailing slash) so
    the httpdir crawler works against any mirrored tree without
    hand-written HTML.  Picklable (just the root string), so Ray tasks can
    carry it.
    """

    def __init__(self, root: str):
        self.root = root

    def _local(self, url: str) -> tuple[str, str]:
        p = urlparse(url)
        base = os.path.join(self.root, p.netloc, unquote(p.path).lstrip("/"))
        return base.rstrip("/"), p.query

    def get(self, url: str) -> bytes | None:
        base, query = self._local(url)
        if query:
            # the query stays percent-encoded in the filename (a decoded
            # %2F would become a path separator)
            qfile = f"{base}?{query}"
            if os.path.isfile(qfile):
                with open(qfile, "rb") as f:
                    return f.read()
        if os.path.isfile(base):
            with open(base, "rb") as f:
                return f.read()
        if os.path.isdir(base):
            index = os.path.join(base, "index.html")
            if os.path.isfile(index):
                with open(index, "rb") as f:
                    return f.read()
            rows = []
            for name in sorted(os.listdir(base)):
                href = quote(name) + ("/" if os.path.isdir(os.path.join(base, name)) else "")
                rows.append(f'<tr><td><a href="{href}">{name}</a></td></tr>')
            body = (
                "<html><head><title>Index of</title></head><body>\n"
                '<a href="../">Parent Directory</a>\n' + "\n".join(rows) + "\n</body></html>"
            )
            return body.encode()
        return None  # 404

    def exists(self, url: str) -> bool:
        base, query = self._local(url)
        if query and os.path.isfile(f"{base}?{query}"):
            return True
        return os.path.isfile(base) or os.path.isdir(base)


class HttpFetcher:
    """Minimal stdlib HTTP client (the real-deployment fetcher).

    404 returns None like the reference treats missing folders
    (httpdir.rs:343); other failures raise :class:`RemoteError`.
    """

    def __init__(self, headers: dict[str, str] | None = None, timeout: float = 30.0):
        self.headers = dict(headers or {})
        self.timeout = timeout

    def _request(self, url: str, method: str):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=self.headers, method=method)
        try:
            return urllib.request.urlopen(req, timeout=self.timeout)
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise RemoteError(f"bad httpdir request: {url}: {e}") from e
        except urllib.error.URLError as e:
            raise RemoteError(f"bad httpdir request: {url}: {e}") from e

    def get(self, url: str) -> bytes | None:
        resp = self._request(url, "GET")
        return None if resp is None else resp.read()

    def exists(self, url: str) -> bool:
        return self._request(url, "HEAD") is not None


# ---------------------------------------------------------------------------
# httpdir — "Index of" crawler (httpdir.rs:348-365, 225-259)

# href must start with a path-ish character: rejects "?C=N;O=D" sort links
# and "../" parents while allowing absolute ("/logs/..") and relative names;
# leading "./" prefixes are stripped by the first group (httpdir.rs:350).
_HREF_RE = re.compile(r'<a href="(\./)*([\\/a-zA-Z0-9][^"]+)"')

# Directories a crawl must never descend into (httpdir.rs:236-241).
_SKIPPED_DIR_SUFFIXES = ("/etc/", "/proc/", "/sys/")


def parse_index_of(base_url: str, page: str) -> list[str]:
    """Extract child URLs from one autoindex page.

    Anything under a "Logs of interest" footer is ignored — those are
    curated deep links that may 404 (httpdir.rs:353-358).
    """
    cut = page.find("Logs of interest")
    if cut != -1:
        page = page[:cut]
    return [urljoin(base_url, m.group(2)) for m in _HREF_RE.finditer(page)]


def _as_dir_url(url: str) -> str | None:
    """A trailing slash marks a directory; ``.../index.html`` is the same
    directory spelled differently (httpdir.rs:317-328)."""
    path = urlparse(url).path
    if path.endswith("/"):
        return url
    if path.endswith("/index.html"):
        return url[: len(url) - len("index.html")]
    return None


def httpdir_list(
    url: str, fetcher, *, request_max: int = 2500
) -> tuple[list[str], list[str]]:
    """Crawl an autoindex tree breadth-first; return (file_urls, errors).

    Loop protection mirrors the reference Visitor: a directory is entered
    only once, only when its URL still starts with the page that listed it
    (kills parent links and cross-host hrefs), and only when its path is
    strictly longer (kills self links).  A missing page (404) contributes
    no entries rather than failing the crawl.
    """
    start = url if url.endswith("/") else url + "/"
    visited: set[str] = set()
    files: list[str] = []
    errors: list[str] = []
    frontier = [start]
    requests = 0
    while frontier:
        page_url = frontier.pop()
        if page_url in visited:
            continue
        visited.add(page_url)
        if requests >= request_max:
            errors.append("reached maximum request count")
            break
        requests += 1
        body = fetcher.get(page_url)
        if body is None:
            continue
        for link in parse_index_of(page_url, body.decode("utf-8", errors="replace")):
            if urlparse(link).path.endswith(_SKIPPED_DIR_SUFFIXES):
                continue
            if not link.startswith(page_url):
                continue
            sub = _as_dir_url(link)
            if sub is not None:
                if len(urlparse(sub).path) > len(urlparse(page_url).path):
                    frontier.append(sub)
            else:
                files.append(link)
    return files, errors


# ---------------------------------------------------------------------------
# Zuul (zuul.rs, zuul-build.rs, zuul_inventory.rs, zuul_manifest.rs)


@dataclass
class ZuulBuild:
    """The resolved build content (report crate's ZuulBuild analog)."""

    api: str  # tenant API base, trailing slash
    uuid: str
    job_name: str
    project: str
    branch: str
    result: str
    pipeline: str
    log_url: str
    ref_url: str
    end_time: datetime
    change: int = 0


def _parse_py_utc(s: str) -> datetime:
    """Zuul timestamps are naive UTC without a trailing Z
    (zuul-build.rs:183-206); accept the Z spelling too."""
    return datetime.fromisoformat(s.rstrip("Z")).replace(tzinfo=timezone.utc)


def decode_zuul_build(obj: dict) -> dict | None:
    """Normalize one API build to the legacy flat shape
    (zuul-build.rs:72-166): the v10 format nests project/branch/change/
    ref_url under ``ref``; durations are sometimes floats.  Returns None
    for undecodable entries (the API sometimes emits builds without a
    uuid — decode_builds filters them, zuul-build.rs:168-180)."""
    try:
        ref = obj["ref"] if isinstance(obj.get("ref"), dict) else obj
        return {
            "uuid": obj["uuid"],
            "job_name": obj["job_name"],
            "result": obj["result"],
            "start_time": _parse_py_utc(obj["start_time"]),
            "end_time": _parse_py_utc(obj["end_time"]),
            "duration": int(float(obj["duration"])),
            "voting": bool(obj["voting"]),
            "log_url": obj.get("log_url"),
            "ref_url": ref.get("ref_url"),
            "artifacts": obj.get("artifacts", []),
            "project": ref["project"],
            "branch": ref["branch"],
            "pipeline": obj["pipeline"],
            "change": ref.get("change"),
            "patchset": ref.get("patchset"),
        }
    except (KeyError, TypeError, ValueError):
        return None


def decode_zuul_builds(data: bytes) -> list[dict]:
    builds = json.loads(data)
    return [b for b in (decode_zuul_build(o) for o in builds) if b is not None]


def _is_zuul_uid(s: str) -> bool:
    return len(s) == 32 and s.isalnum() and s.isascii()


def zuul_api_url_from_build_url(url: str) -> tuple[str, str] | None:
    """Recover (tenant api url, uuid) from a build page URL
    (zuul.rs:241-282): multi-tenant ``.../t/<tenant>/build/<uid>`` or a
    whitelabel ``.../build/<uid>``."""
    segments = [s for s in urlparse(url).path.split("/") if s]
    if len(segments) < 2 or segments[-2] != "build" or not _is_zuul_uid(segments[-1]):
        return None
    uid = segments[-1]
    if len(segments) >= 4 and segments[-4] == "t":
        base = url.split("/t/", 1)[0]
        return f"{base}/api/tenant/{segments[-3]}/", uid
    base = url.rsplit("/build/", 1)[0]
    return f"{base}/api/", uid


def zuul_build_from_inventory(api_base: str, inventory: dict | str) -> ZuulBuild:
    """Build a ZuulBuild from a zuul-info/inventory.yaml document
    (zuul.rs:24-49): the target is assumed FAILED and the log_url points
    at the build API record."""
    if isinstance(inventory, str):
        import yaml

        inventory = yaml.safe_load(inventory)
    vars_zuul = inventory["all"]["vars"]["zuul"]
    if not api_base.endswith("/"):
        api_base += "/"
    api = urljoin(api_base, f"api/tenant/{vars_zuul['tenant']}/")
    return ZuulBuild(
        api=api,
        uuid=vars_zuul["build"],
        job_name=vars_zuul["job"],
        project=vars_zuul["project"]["name"],
        branch=vars_zuul["branch"],
        result="FAILED",
        pipeline=vars_zuul["pipeline"],
        log_url=urljoin(api, f"build/{vars_zuul['build']}"),
        ref_url=vars_zuul["change_url"],
        end_time=datetime.now(timezone.utc),
        change=0,
    )


def zuul_manifest_urls(manifest: dict, log_url: str) -> list[str]:
    """Flatten a zuul-manifest.json tree to file URLs
    (zuul_manifest.rs:21-44); names are percent-encoded per segment."""
    if not log_url.endswith("/"):
        log_url += "/"
    out: list[str] = []

    def walk(tree: dict, base: str) -> None:
        name = quote(tree["name"], safe="")
        if tree.get("mimetype") == "application/directory":
            sub = urljoin(base, name + "/")
            for child in tree.get("children", []):
                walk(child, sub)
        else:
            out.append(urljoin(base, name))

    for tree in manifest.get("tree", []):
        walk(tree, log_url)
    return out


def zuul_baseline_score(build: ZuulBuild, target: dict, now) -> int | None:
    """Score a candidate baseline build (zuul.rs:110-137).  Returns None
    when the candidate has no log/ref URL (unusable)."""
    score = 0
    if build.project == target["project"]:
        if build.change == target.get("change") or build.ref_url == target.get("ref_url"):
            score -= 500  # never compare a change against itself
        else:
            score += 50
    if build.branch == target["branch"]:
        score += 50
    if "gate" in target["pipeline"] or "periodic" in target["pipeline"]:
        score += 50
    if target["voting"]:
        score += 10
    score -= max(0, (now - target["end_time"].date()).days)
    if target.get("log_url") and target.get("ref_url"):
        return score
    return None


def _zuul_get_builds(fetcher, api: str, args: list[tuple[str, str]]) -> list[dict]:
    url = urljoin(api, "builds") + "?" + urlencode(args)
    body = fetcher.get(url)
    if body is None:
        return []
    return decode_zuul_builds(body)


def zuul_discover_baselines(
    build: ZuulBuild, fetcher, *, now=None, max_builds: int = 1
) -> list[ZuulBuild]:
    """Find the best SUCCESS build(s) of the same job to train against
    (zuul.rs:88-176): query with the project filter, fall back without it,
    score, drop the build itself and stalled log URLs, keep the best."""
    args = [
        ("project", build.project),
        ("job_name", build.job_name),
        ("complete", "true"),
        ("limit", "500"),
        ("result", "SUCCESS"),
    ]
    builds = _zuul_get_builds(fetcher, build.api, args)
    if not builds:
        builds = _zuul_get_builds(fetcher, build.api, args[1:])
    if now is None:
        now = datetime.now(timezone.utc).date()
    scored = [(zuul_baseline_score(build, t, now), t) for t in builds]
    ranked = sorted(
        (
            (s, i, t)
            for i, (s, t) in enumerate(scored)
            if s is not None and t["uuid"] != build.uuid
        ),
        key=lambda sit: (-sit[0], sit[1]),
    )
    out: list[ZuulBuild] = []
    for _score, _i, t in ranked:
        if not fetcher.exists(t["log_url"]):
            continue  # logs already garbage-collected: skip (zuul.rs:139-154)
        out.append(
            ZuulBuild(
                api=build.api,
                uuid=t["uuid"],
                job_name=t["job_name"],
                project=t["project"],
                branch=t["branch"],
                result=t["result"],
                pipeline=t["pipeline"],
                log_url=t["log_url"],
                ref_url=t["ref_url"],
                end_time=t["end_time"],
                change=t.get("change") or 0,
            )
        )
        if len(out) >= max_builds:
            break
    return out


def zuul_sources(build: ZuulBuild, fetcher) -> tuple[int, list[str]]:
    """List a build's log files: prefer the zuul-manifest.json (one fetch,
    exact tree), fall back to an httpdir crawl (zuul.rs:178-205).  Returns
    (relative-path prefix length, urls)."""
    log_url = build.log_url if build.log_url.endswith("/") else build.log_url + "/"
    prefix = len(build.log_url.rstrip("/")) + 1
    body = fetcher.get(urljoin(log_url, "zuul-manifest.json"))
    if body is not None:
        try:
            manifest = json.loads(body)
        except ValueError as e:
            snippet = body[:32].decode("utf-8", errors="replace")
            raise RemoteError(f"zuul-manifest decode error: {e}, got '{snippet}'") from e
        return prefix, zuul_manifest_urls(manifest, log_url)
    return prefix, httpdir_list(log_url, fetcher)[0]


# ---------------------------------------------------------------------------
# Prow (prow.rs, prow_build.rs)


@dataclass
class ProwBuild:
    """A prow build view page (report crate's ProwBuild analog)."""

    url: str
    uid: str
    job_name: str
    project: str
    pr: int
    storage_type: str
    storage_path: str


def parse_prow_url(url: str) -> ProwBuild | None:
    """Decode a spyglass view URL (prow.rs:17-39):
    ``/view/<storage>/<bucket>/pr-logs/pull/<project>/<pr>/<job>/<uid>``."""
    segments = [s for s in urlparse(url).path.split("/") if s]
    if len(segments) != 9 or segments[0] != "view" or segments[3:5] != ["pr-logs", "pull"]:
        return None
    _, storage_type, storage_path, _, _, project, pr, job, uid = segments
    if not uid.isdigit():
        raise RemoteError(f"{url}: couldn't decode build info")
    try:
        pr_num = int(pr)
    except ValueError as e:
        raise RemoteError(f"{pr}: invalid pr number") from e
    return ProwBuild(
        url=url,
        uid=uid,
        job_name=job,
        project=project,
        pr=pr_num,
        storage_type=storage_type,
        storage_path=storage_path,
    )


_ARTIFACTS_RE = re.compile(r'<a href="(http[^"]+)">Artifacts</a>')


def prow_artifact_url(view_page: str) -> str:
    """The artifacts link on the spyglass page (prow.rs:68-85)."""
    m = _ARTIFACTS_RE.search(view_page)
    if m is None:
        raise RemoteError("could not find artifacts link")
    return m.group(1)


def parse_prow_job_history(page: str) -> list[dict]:
    """Builds are embedded as a JS array (``var allBuilds = [...]``) in
    the job-history page — prow has no REST API (prow_build.rs:186-222)."""
    for line in page.splitlines():
        if line.strip().startswith("var allBuilds = "):
            payload = line.split("=", 1)[1].strip().rstrip(";")
            rows = json.loads(payload)
            return [
                {
                    "uid": r["ID"],
                    "path": r["SpyglassLink"],
                    "result": r["Result"],
                    "started": r["Started"],
                    "duration": r["Duration"],
                }
                for r in rows
            ]
    raise RemoteError("Api response didn't contain builds")


def prow_iter_builds(fetcher, api_url: str, storage_type: str, storage_path: str, job_name: str):
    """Paginate the job history with ``?buildId=<last>`` until an empty
    page (prow_build.rs:128-184)."""
    p = urlparse(api_url)
    base = f"{p.scheme}://{p.netloc}/job-history/{storage_type}/{storage_path}/pr-logs/directory/{job_name}"
    after: str | None = None
    while True:
        url = base if after is None else f"{base}?buildId={after}"
        body = fetcher.get(url)
        if body is None:
            raise RemoteError(f"bad api query: {url}")
        builds = parse_prow_job_history(body.decode("utf-8", errors="replace"))
        if not builds:
            return
        yield from builds
        after = builds[-1]["uid"]


def prow_discover_baselines(
    build: ProwBuild, fetcher, *, max_scan: int = 200
) -> list[ProwBuild]:
    """First SUCCESS build within the most recent ``max_scan`` runs of the
    same job (prow.rs:131-152)."""
    for i, candidate in enumerate(
        prow_iter_builds(fetcher, build.url, build.storage_type, build.storage_path, build.job_name)
    ):
        if i >= max_scan:
            break
        if candidate["result"] == "SUCCESS":
            return [
                ProwBuild(
                    url=urljoin(build.url, candidate["path"]),
                    uid=candidate["uid"],
                    job_name=build.job_name,
                    project="tbd",
                    pr=0,
                    storage_type=build.storage_type,
                    storage_path=build.storage_path,
                )
            ]
    return []


def prow_sources(build: ProwBuild, fetcher) -> tuple[int, list[str]]:
    """Crawl the artifacts dir linked from the view page (prow.rs:154-159)."""
    body = fetcher.get(build.url)
    if body is None:
        raise RemoteError(f"bad api query: {build.url}")
    artifacts = prow_artifact_url(body.decode("utf-8", errors="replace"))
    prefix = len(artifacts.rstrip("/")) + 1
    return prefix, httpdir_list(artifacts, fetcher)[0]


# ---------------------------------------------------------------------------
# URL dispatch + the Ray data plane

#: authorities whose view URLs auto-dispatch to the prow connector
#: (prow.rs:59-66)
PROW_AUTHORITIES = frozenset({"prow.ci.openshift.org"})


def content_from_url(url: str, fetcher):
    """Classify a URL like urls.rs:10-22: ("zuul", ZuulBuild) /
    ("prow", ProwBuild) / ("dir", url) / ("file", url)."""
    p = urlparse(url)
    if not p.netloc:
        raise RemoteError(f"Bad url {url}")
    api_uid = zuul_api_url_from_build_url(url)
    if api_uid is not None:
        api, uid = api_uid
        body = fetcher.get(urljoin(api, f"build/{uid}"))
        if body is None:
            raise RemoteError(f"bad api query: {api}build/{uid}")
        b = decode_zuul_build(json.loads(body))
        if b is None or not b.get("log_url") or not b.get("ref_url"):
            raise RemoteError("input build has no log_url")
        return "zuul", ZuulBuild(
            api=api,
            uuid=b["uuid"],
            job_name=b["job_name"],
            project=b["project"],
            branch=b["branch"],
            result=b["result"],
            pipeline=b["pipeline"],
            log_url=b["log_url"],
            ref_url=b["ref_url"],
            end_time=b["end_time"],
            change=b.get("change") or 0,
        )
    if p.netloc in PROW_AUTHORITIES:
        build = parse_prow_url(url)
        if build is not None:
            return "prow", build
    if url.endswith("/"):
        return "dir", url
    return "file", url


def _remote_rows_table(entries, role: str):
    """turns-schema rows for (url, relative_path, lines) triples; group
    key = IndexName of the relative path, like a local dir scan."""
    import pyarrow as pa

    from ..index_name import index_name_from_path
    from .archives import _TURNS_SCHEMA

    conv, idx, text, tool = [], [], [], []
    for url, rel, lines in entries:
        name = index_name_from_path(rel)
        n = len(lines)
        conv.extend([url] * n)
        idx.extend(range(n))
        text.extend(lines)
        tool.extend([name] * n)
    n = len(conv)
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(idx, pa.int64()),
            "role": pa.array([role] * n, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.nulls(n, pa.timestamp("us")),
        },
        schema=_TURNS_SCHEMA,
    )


def read_url_lines(
    urls: list[str],
    prefix: int,
    fetcher,
    *,
    role: str = "file",
    target_config=None,
    max_entry_bytes: int | None = None,
    error_collector=None,
):
    """Turns-schema Dataset over discovered file URLs — one fetch task per
    file (the data plane).  Per-file ``.gz``/``.xz`` payloads decompress in
    the task; a remote tarball expands through the archive reader with
    ``?entry=`` provenance; invalid paths are dropped by the config's
    ``is_fp_valid`` BEFORE any fetch (prune at the read).  Failed fetches
    and corrupt payloads are skipped AND recorded through the optional
    ``error_collector`` (report.rs:112 read_errors analog)."""
    import pyarrow as pa
    import ray.data as rd

    from .read_errors import report_read_error

    from .archives import (
        DEFAULT_MAX_ENTRY_BYTES,
        _TURNS_SCHEMA,
        _decompress_member,
        _entry_rows,
        is_tarball_path,
        iter_archive_entries,
    )

    cap = max_entry_bytes or DEFAULT_MAX_ENTRY_BYTES
    fp_valid = target_config.is_fp_valid if target_config is not None else None
    specs = []
    for u in urls:
        rel = unquote(u[prefix:])
        if fp_valid is not None and not fp_valid(rel):
            continue
        specs.append({"url": u, "rel": rel})
    if not specs:
        return rd.from_arrow(_TURNS_SCHEMA.empty_table())

    def fetch(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            url, rel = row["url"], row["rel"]
            raw = fetcher.get(url)
            if raw is None:
                report_read_error(error_collector, url, "fetch failed")
                continue
            if is_tarball_path(rel.removesuffix(".gz").removesuffix(".xz")) or is_tarball_path(rel):
                import tarfile as _tarfile

                try:
                    entries = [
                        (u, u.split("?entry=", 1)[-1].rsplit("&sub=", 1)[-1], lines)
                        for u, lines in iter_archive_entries(
                            url, io.BytesIO(raw), fp_valid=fp_valid, max_entry_bytes=cap
                        )
                    ]
                except (OSError, EOFError, _tarfile.TarError) as e:
                    # corrupt remote archive: skip, never fail the scan
                    report_read_error(error_collector, url, e)
                    continue
                out.append(_remote_rows_table(entries, role))
                continue
            try:
                data = _decompress_member(rel, raw)
            except Exception as e:
                report_read_error(error_collector, url, e)
                continue  # corrupt compressed payload: skip the file
            u2, lines = _entry_rows(url, data, cap)
            out.append(_remote_rows_table([(u2, rel, lines)], role))
        if not out:
            return _TURNS_SCHEMA.empty_table()
        return pa.concat_tables(out)

    return rd.from_items(specs).map_batches(fetch, batch_format="pyarrow", batch_size=4)


def sources_for_content(kind: str, obj, fetcher) -> tuple[int, list[str]]:
    """Resolve a classified content to its (prefix, file urls)."""
    if kind == "zuul":
        return zuul_sources(obj, fetcher)
    if kind == "prow":
        return prow_sources(obj, fetcher)
    if kind == "dir":
        prefix = len(obj.rstrip("/")) + 1
        return prefix, httpdir_list(obj, fetcher)[0]
    # single file: relative name = basename
    return obj.rfind("/") + 1, [obj]
