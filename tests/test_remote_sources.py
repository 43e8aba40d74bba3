"""Remote connector tests — httpdir crawl, Zuul build API, Prow job
history (crates/httpdir/src/httpdir.rs, crates/model/src/{urls,zuul,prow}.rs,
crates/zuul/src/*, crates/prow/src/prow_build.rs) — all offline via
LocalMirrorFetcher."""

import gzip
import json
import os
import tarfile
import io
from datetime import date, datetime, timezone

import pytest

from logjuicer_ray.sources.remote import (
    LocalMirrorFetcher,
    ProwBuild,
    RemoteError,
    ZuulBuild,
    content_from_url,
    decode_zuul_build,
    decode_zuul_builds,
    httpdir_list,
    parse_index_of,
    parse_prow_job_history,
    parse_prow_url,
    prow_artifact_url,
    prow_discover_baselines,
    prow_iter_builds,
    prow_sources,
    read_url_lines,
    sources_for_content,
    zuul_api_url_from_build_url,
    zuul_baseline_score,
    zuul_build_from_inventory,
    zuul_discover_baselines,
    zuul_manifest_urls,
    zuul_sources,
)

BASE = "http://logs.example.com/job/7/"


# ---------------------------------------------------------------------------
# parse_index_of


def test_parse_index_apache_table():
    page = """
<html><body><h1>Index of /job/7</h1><table>
<tr><th><a href="?C=N;O=D">Name</a></th><th><a href="?C=M;O=A">Modified</a></th></tr>
<tr><td><a href="/job/">Parent Directory</a></td></tr>
<tr><td><a href="console.log.gz">console.log.gz</a></td><td>2024-04-01 12:00</td></tr>
<tr><td><a href="systemd/">systemd/</a></td><td>2024-04-01 12:00</td></tr>
</table></body></html>
"""
    urls = parse_index_of(BASE, page)
    # sort links (?C=...) and the bare parent are rejected by the href
    # first-character class; the absolute parent IS captured (filtered
    # later by the crawl's starts-with check)
    assert urls == [
        "http://logs.example.com/job/",
        "http://logs.example.com/job/7/console.log.gz",
        "http://logs.example.com/job/7/systemd/",
    ]


def test_parse_index_nginx_fancyindex_dot_slash():
    page = """
<tr><td class="name up"><a href="../">..</a></td></tr>
<tr class="entry"><td class="name file"><a href="./report.1.html">report.1.html</a></td></tr>
<tr class="entry"><td class="name dir"><a href="./compute-0/">compute-0/</a></td></tr>
"""
    urls = parse_index_of(BASE, page)
    assert urls == [BASE + "report.1.html", BASE + "compute-0/"]


def test_parse_index_footer_cut():
    page = '<a href="data/">data/</a>\n<h3>Logs of interest</h3>\n<li><a href="./data/logs/special/">special</a>'
    assert parse_index_of(BASE, page) == [BASE + "data/"]


# ---------------------------------------------------------------------------
# httpdir crawl over a local mirror


def _write(path: str, data) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(path, mode) as f:
        f.write(data)


@pytest.fixture()
def mirror(tmp_path):
    root = str(tmp_path / "mirror")
    host = os.path.join(root, "logs.example.com", "job", "7")
    _write(os.path.join(host, "job-output.txt"), "line one\nline two\n")
    _write(os.path.join(host, "zuul-info", "inventory.yaml"), "all: {}\n")
    _write(os.path.join(host, "etc", "passwd"), "root:x:0:0\n")
    _write(os.path.join(host, "sub", "deep", "x.log"), "deep\n")
    return root


def test_httpdir_list_walks_tree_and_skips_etc(mirror):
    files, errors = httpdir_list(BASE, LocalMirrorFetcher(mirror))
    assert errors == []
    assert sorted(files) == [
        BASE + "job-output.txt",
        BASE + "sub/deep/x.log",
        BASE + "zuul-info/inventory.yaml",
    ]


def test_httpdir_request_max(mirror):
    files, errors = httpdir_list(BASE, LocalMirrorFetcher(mirror), request_max=1)
    assert any("maximum request count" in e for e in errors)


def test_httpdir_missing_page_is_empty(mirror):
    files, errors = httpdir_list(
        "http://logs.example.com/nope/", LocalMirrorFetcher(mirror)
    )
    assert files == [] and errors == []


def test_mirror_index_html_override(tmp_path):
    root = str(tmp_path)
    _write(
        os.path.join(root, "h.example.com", "d", "index.html"),
        '<a href="only.log">only.log</a><a href="hidden.log">x</a>',
    )
    _write(os.path.join(root, "h.example.com", "d", "only.log"), "x\n")
    files, _ = httpdir_list("http://h.example.com/d/", LocalMirrorFetcher(root))
    assert files == [
        "http://h.example.com/d/only.log",
        "http://h.example.com/d/hidden.log",
    ]


# ---------------------------------------------------------------------------
# zuul url / build / inventory / manifest decode


def test_zuul_api_url_multitenant_and_whitelabel():
    uid = "a" * 16 + "0" * 16
    assert zuul_api_url_from_build_url(
        f"https://zuul.example.com/t/main/build/{uid}"
    ) == ("https://zuul.example.com/api/tenant/main/", uid)
    assert zuul_api_url_from_build_url(
        f"https://review.example.org/zuul/build/{uid}"
    ) == ("https://review.example.org/zuul/api/", uid)
    assert zuul_api_url_from_build_url("https://zuul.example.com/t/main/build/short") is None
    assert zuul_api_url_from_build_url("https://zuul.example.com/status") is None


LEGACY_BUILD = {
    "uuid": "b" * 32,
    "job_name": "tox-py311",
    "result": "SUCCESS",
    "start_time": "2024-04-01T10:00:00",
    "end_time": "2024-04-01T10:10:00",
    "duration": 600.0,
    "voting": True,
    "log_url": "http://logs.example.com/job/6/",
    "ref_url": "https://review.example.org/1234",
    "artifacts": [],
    "project": "acme/widget",
    "branch": "main",
    "pipeline": "gate",
    "change": 1234,
    "patchset": "2",
    "ref": "refs/changes/34/1234/2",
}


def _new_format(uuid: str, **over) -> dict:
    b = {
        "uuid": uuid,
        "job_name": "tox-py311",
        "result": "SUCCESS",
        "start_time": "2024-04-02T10:00:00",
        "end_time": "2024-04-02T10:09:00",
        "duration": 540.0,
        "voting": True,
        "log_url": "http://logs.example.com/job/7/",
        "artifacts": [],
        "pipeline": "check",
        "ref": {
            "project": "acme/widget",
            "branch": "main",
            "change": 999,
            "patchset": "1",
            "ref": "refs/changes/99/999/1",
            "ref_url": "https://review.example.org/999",
        },
    }
    b.update(over)
    return b


def test_decode_zuul_build_both_formats():
    legacy = decode_zuul_build(LEGACY_BUILD)
    assert legacy["project"] == "acme/widget" and legacy["duration"] == 600
    assert legacy["end_time"] == datetime(2024, 4, 1, 10, 10, tzinfo=timezone.utc)
    new = decode_zuul_build(_new_format("c" * 32))
    assert new["ref_url"] == "https://review.example.org/999"
    assert new["change"] == 999 and new["branch"] == "main"
    # undecodable rows (no uuid) are filtered, not fatal
    rows = decode_zuul_builds(json.dumps([LEGACY_BUILD, {"junk": 1}]).encode())
    assert len(rows) == 1


def test_zuul_build_from_inventory():
    inv = """
all:
  hosts:
    node-0: {}
  vars:
    zuul:
      branch: main
      build: 902789976f6349709955cb9f8786ba1d
      change: '42'
      change_url: https://review.example.org/42
      job: lint
      pipeline: check
      project:
        name: acme/widget
      tenant: local
"""
    b = zuul_build_from_inventory("https://zuul.example.com/zuul/", inv)
    assert b.api == "https://zuul.example.com/zuul/api/tenant/local/"
    assert b.log_url.endswith("/api/tenant/local/build/902789976f6349709955cb9f8786ba1d")
    assert b.result == "FAILED" and b.job_name == "lint"


def test_zuul_manifest_urls_encoding_and_nesting():
    manifest = {
        "tree": [
            {
                "name": "zuul-info",
                "mimetype": "application/directory",
                "children": [{"name": "host-info.yaml", "mimetype": "text/plain"}],
            },
            {"name": "job-output.txt", "mimetype": "text/plain"},
            {
                "name": "DEV:01",
                "mimetype": "application/directory",
                "children": [{"name": "x", "mimetype": "text/plain"}],
            },
        ]
    }
    # base without trailing slash gets one added
    urls = zuul_manifest_urls(manifest, "http://logs.example.com/job/7")
    assert urls == [
        "http://logs.example.com/job/7/zuul-info/host-info.yaml",
        "http://logs.example.com/job/7/job-output.txt",
        "http://logs.example.com/job/7/DEV%3A01/x",
    ]


# ---------------------------------------------------------------------------
# zuul baseline scoring + discovery


def _target_build() -> ZuulBuild:
    return ZuulBuild(
        api="https://zuul.example.com/api/tenant/main/",
        uuid="f" * 32,
        job_name="tox-py311",
        project="acme/widget",
        branch="main",
        result="FAILURE",
        pipeline="check",
        log_url="http://logs.example.com/job/7/",
        ref_url="https://review.example.org/7777",
        end_time=datetime(2024, 4, 2, tzinfo=timezone.utc),
        change=7777,
    )


def test_zuul_baseline_score_rules():
    now = date(2024, 4, 10)
    build = _target_build()
    cand = decode_zuul_build(LEGACY_BUILD)
    # same project (+50), same branch (+50), gate pipeline (+50),
    # voting (+10), 9 days old (-9)
    assert zuul_baseline_score(build, cand, now) == 151
    same_change = dict(cand, change=7777)
    assert zuul_baseline_score(build, same_change, now) == -500 + 50 + 50 + 10 - 9
    no_logs = dict(cand, log_url=None)
    assert zuul_baseline_score(build, no_logs, now) is None
    other_project = dict(cand, project="other/thing")
    assert zuul_baseline_score(build, other_project, now) == 50 + 50 + 10 - 9


def _api_dir(root: str) -> str:
    return os.path.join(root, "zuul.example.com", "api", "tenant", "main")


def _builds_query(build: ZuulBuild, with_project: bool) -> str:
    args = ([("project", build.project)] if with_project else []) + [
        ("job_name", build.job_name),
        ("complete", "true"),
        ("limit", "500"),
        ("result", "SUCCESS"),
    ]
    from urllib.parse import urlencode

    return "builds?" + urlencode(args)


def test_zuul_discover_baselines_picks_best_live(tmp_path):
    root = str(tmp_path)
    build = _target_build()
    good = decode_zuul_build  # alias for brevity
    candidates = [
        _new_format("1" * 32, log_url="http://logs.example.com/job/5/"),  # dead logs
        _new_format("2" * 32, log_url="http://logs.example.com/job/6/"),
        LEGACY_BUILD,  # gate pipeline: highest score
    ]
    _write(
        os.path.join(_api_dir(root), _builds_query(build, True)),
        json.dumps(candidates),
    )
    # live log dirs for uuid 2... and the legacy build (job/6)
    _write(os.path.join(root, "logs.example.com", "job", "6", "job-output.txt"), "ok\n")
    found = zuul_discover_baselines(build, LocalMirrorFetcher(root), now=date(2024, 4, 10))
    assert len(found) == 1
    assert found[0].uuid == "b" * 32  # the gate build outranks the check build
    assert found[0].log_url == "http://logs.example.com/job/6/"


def test_zuul_discover_project_fallback(tmp_path):
    root = str(tmp_path)
    build = _target_build()
    # project-filtered query returns an empty list -> retry without it
    _write(os.path.join(_api_dir(root), _builds_query(build, True)), "[]")
    _write(
        os.path.join(_api_dir(root), _builds_query(build, False)),
        json.dumps([LEGACY_BUILD]),
    )
    _write(os.path.join(root, "logs.example.com", "job", "6", "job-output.txt"), "ok\n")
    found = zuul_discover_baselines(build, LocalMirrorFetcher(root), now=date(2024, 4, 10))
    assert [b.uuid for b in found] == ["b" * 32]


def test_zuul_sources_manifest_then_crawl(tmp_path, mirror):
    build = _target_build()
    # no manifest in the mirror -> httpdir fallback
    prefix, files = zuul_sources(build, LocalMirrorFetcher(mirror))
    assert prefix == len("http://logs.example.com/job/7/")
    assert BASE + "job-output.txt" in files
    # with a manifest: exact tree, no crawl
    _write(
        os.path.join(mirror, "logs.example.com", "job", "7", "zuul-manifest.json"),
        json.dumps({"tree": [{"name": "job-output.txt", "mimetype": "text/plain"}]}),
    )
    prefix, files = zuul_sources(build, LocalMirrorFetcher(mirror))
    assert files == [BASE + "job-output.txt"]
    # corrupt manifest is a hard error with a snippet (zuul.rs:189-194)
    _write(
        os.path.join(mirror, "logs.example.com", "job", "7", "zuul-manifest.json"),
        "<html>not json",
    )
    with pytest.raises(RemoteError, match="zuul-manifest decode error"):
        zuul_sources(build, LocalMirrorFetcher(mirror))


# ---------------------------------------------------------------------------
# prow


PROW_URL = (
    "https://prow.ci.openshift.org/view/gs/test-bucket/pr-logs/pull/"
    "acme_widget/437/pull-widget-e2e/1689624623181729792"
)


def test_parse_prow_url():
    b = parse_prow_url(PROW_URL)
    assert b == ProwBuild(
        url=PROW_URL,
        uid="1689624623181729792",
        job_name="pull-widget-e2e",
        project="acme_widget",
        pr=437,
        storage_type="gs",
        storage_path="test-bucket",
    )
    assert parse_prow_url("https://prow.ci.openshift.org/view/gs/bucket/short") is None
    with pytest.raises(RemoteError):
        parse_prow_url(PROW_URL.replace("1689624623181729792", "not-digits"))


def test_prow_artifact_url():
    page = '<div><a href="/pr-history?pr=437">PR History</a>\n<a href="https://gcs.example.com/bucket/437/">Artifacts</a></div>'
    assert prow_artifact_url(page) == "https://gcs.example.com/bucket/437/"
    with pytest.raises(RemoteError):
        prow_artifact_url("<html>nothing here</html>")


def _history_page(rows) -> str:
    return "<script>\n  var allBuilds = %s;\n</script>" % json.dumps(rows)


def _history_row(uid: str, result: str) -> dict:
    return {
        "SpyglassLink": f"/view/gs/test-bucket/pr-logs/pull/acme_widget/437/pull-widget-e2e/{uid}",
        "ID": uid,
        "Started": "2024-04-01T13:38:24Z",
        "Duration": 241000000000,
        "Result": result,
    }


def test_parse_prow_job_history():
    rows = parse_prow_job_history(_history_page([_history_row("100", "FAILURE")]))
    assert rows[0]["uid"] == "100" and rows[0]["result"] == "FAILURE"
    with pytest.raises(RemoteError):
        parse_prow_job_history("<html>no builds var</html>")


def test_prow_pagination_and_discovery(tmp_path):
    root = str(tmp_path)
    hist_dir = os.path.join(
        root, "prow.ci.openshift.org", "job-history", "gs", "test-bucket",
        "pr-logs", "directory",
    )
    # page 1: two failures; page 2: one success; page 3: empty (stop)
    _write(
        os.path.join(hist_dir, "pull-widget-e2e"),
        _history_page([_history_row("300", "FAILURE"), _history_row("200", "FAILURE")]),
    )
    _write(
        os.path.join(hist_dir, "pull-widget-e2e?buildId=200"),
        _history_page([_history_row("100", "SUCCESS")]),
    )
    _write(os.path.join(hist_dir, "pull-widget-e2e?buildId=100"), _history_page([]))
    fetcher = LocalMirrorFetcher(root)
    build = parse_prow_url(PROW_URL)
    all_builds = list(
        prow_iter_builds(fetcher, build.url, "gs", "test-bucket", "pull-widget-e2e")
    )
    assert [b["uid"] for b in all_builds] == ["300", "200", "100"]
    found = prow_discover_baselines(build, fetcher)
    assert len(found) == 1 and found[0].uid == "100"
    assert found[0].url.endswith("/pull-widget-e2e/100")


def test_prow_sources_crawls_artifacts(tmp_path):
    root = str(tmp_path)
    view_rel = PROW_URL.split("prow.ci.openshift.org/")[1]
    _write(
        os.path.join(root, "prow.ci.openshift.org", view_rel),
        '<a href="http://gcs.example.com/bucket/437/">Artifacts</a>',
    )
    _write(os.path.join(root, "gcs.example.com", "bucket", "437", "build-log.txt"), "hi\n")
    build = parse_prow_url(PROW_URL)
    prefix, files = prow_sources(build, LocalMirrorFetcher(root))
    assert files == ["http://gcs.example.com/bucket/437/build-log.txt"]
    assert files[0][prefix:] == "build-log.txt"


# ---------------------------------------------------------------------------
# dispatch


def test_content_from_url_dispatch(tmp_path):
    root = str(tmp_path)
    uid = "d" * 32
    _write(
        os.path.join(root, "zuul.example.com", "api", "tenant", "main", "build", uid),
        json.dumps(_new_format(uid)),
    )
    fetcher = LocalMirrorFetcher(root)
    kind, obj = content_from_url(
        f"https://zuul.example.com/t/main/build/{uid}", fetcher
    )
    assert kind == "zuul" and obj.uuid == uid and obj.log_url.endswith("/job/7/")
    kind, obj = content_from_url(PROW_URL, fetcher)
    assert kind == "prow" and obj.pr == 437
    assert content_from_url("http://h/x/", fetcher) == ("dir", "http://h/x/")
    assert content_from_url("http://h/x.log", fetcher) == ("file", "http://h/x.log")
    with pytest.raises(RemoteError):
        content_from_url("not-a-url", fetcher)
    # a zuul build whose API record lacks log_url is unusable (zuul.rs:284-290)
    uid2 = "e" * 32
    _write(
        os.path.join(root, "zuul.example.com", "api", "tenant", "main", "build", uid2),
        json.dumps(_new_format(uid2, log_url=None)),
    )
    with pytest.raises(RemoteError, match="no log_url"):
        content_from_url(f"https://zuul.example.com/t/main/build/{uid2}", fetcher)


# ---------------------------------------------------------------------------
# data plane: read_url_lines (needs ray)


def test_read_url_lines_plain_gz_and_tar(ray_session, tmp_path):
    root = str(tmp_path)
    host = os.path.join(root, "logs.example.com", "job", "7")
    _write(os.path.join(host, "job-output.txt"), "alpha\nbeta\n")
    _write(os.path.join(host, "service.log.gz"), gzip.compress(b"gamma\n"))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        data = b"delta\nepsilon\n"
        info = tarfile.TarInfo("inner/errors.log")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    _write(os.path.join(host, "bundle.tar"), buf.getvalue())
    urls = [
        BASE + "job-output.txt",
        BASE + "service.log.gz",
        BASE + "bundle.tar",
        BASE + "missing.log",  # 404: contributes no rows
    ]
    ds = read_url_lines(urls, len(BASE), LocalMirrorFetcher(root))
    rows = sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["role"]) for r in ds.take_all()
    )
    assert rows == [
        (BASE + "bundle.tar?entry=inner/errors.log", 0, "delta", "file"),
        (BASE + "bundle.tar?entry=inner/errors.log", 1, "epsilon", "file"),
        (BASE + "job-output.txt", 0, "alpha", "file"),
        (BASE + "job-output.txt", 1, "beta", "file"),
        (BASE + "service.log.gz", 0, "gamma", "file"),
    ]


def test_read_url_lines_prunes_with_config(ray_session, tmp_path):
    from logjuicer_ray.config_file import TargetConfig

    root = str(tmp_path)
    host = os.path.join(root, "logs.example.com", "job", "7")
    _write(os.path.join(host, "job-output.txt"), "keep\n")
    _write(os.path.join(host, "skip.png"), "binary\n")
    tc = TargetConfig.from_mapping({})  # pulls in the default excludes (.png$ ...)
    urls = [BASE + "job-output.txt", BASE + "skip.png"]
    ds = read_url_lines(urls, len(BASE), LocalMirrorFetcher(root), target_config=tc)
    assert [r["conv_id"] for r in ds.take_all()] == [BASE + "job-output.txt"]


# ---------------------------------------------------------------------------
# CLI e2e: zuul target url with auto-discovered baseline, fully offline


def test_cli_report_zuul_url_autobaseline(ray_session, tmp_path):
    from logjuicer_ray.cli import main

    root = str(tmp_path / "mirror")
    out = str(tmp_path / "out")
    uid_fail = "9" * 32
    api_dir = os.path.join(root, "zuul.example.com", "api", "tenant", "main")
    # the failed target build record
    _write(
        os.path.join(api_dir, "build", uid_fail),
        json.dumps(
            _new_format(
                uid_fail,
                result="FAILURE",
                log_url="http://logs.example.com/job/7/",
            )
        ),
    )
    # discovery: the query with the project filter returns the good build
    target = ZuulBuild(
        api="https://zuul.example.com/api/tenant/main/",
        uuid=uid_fail,
        job_name="tox-py311",
        project="acme/widget",
        branch="main",
        result="FAILURE",
        pipeline="check",
        log_url="http://logs.example.com/job/7/",
        ref_url="https://review.example.org/999",
        end_time=datetime(2024, 4, 2, tzinfo=timezone.utc),
        change=999,
    )
    baseline_build = dict(
        LEGACY_BUILD, log_url="http://logs.example.com/job/6/", change=4242
    )
    _write(
        os.path.join(api_dir, _builds_query(target, True)),
        json.dumps([baseline_build]),
    )
    good = "".join(f"agent started worker {i} on port 90{i:02d}\n" for i in range(40))
    _write(
        os.path.join(root, "logs.example.com", "job", "6", "job-output.txt"), good
    )
    _write(
        os.path.join(root, "logs.example.com", "job", "7", "job-output.txt"),
        good + "FATAL: disk controller exploded catastrophically\n",
    )
    rc = main(
        [
            "report",
            "--target",
            f"https://zuul.example.com/t/main/build/{uid_fail}",
            "--mirror",
            root,
            "--out",
            out,
            "--quiet",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "summary.json")) as f:
        summary = json.load(f)
    assert summary["sinks"]["anomalies"] >= 1
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logjuicer_ray.sinks import read_manifest

    man = read_manifest(os.path.join(out, "anomalies"))
    table = pa.concat_tables(
        pq.read_table(os.path.join(out, "anomalies", p["file"]))
        for p in man["partitions"]
    )
    texts = "\n".join(table.column("text").to_pylist())
    assert "disk controller exploded" in texts
    assert all(
        c.startswith("http://logs.example.com/job/7/")
        for c in table.column("conv_id").to_pylist()
    )
