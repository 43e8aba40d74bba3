"""Command-line entry points — the analog of the reference CLI
(crates/cli/src/main.rs:202-260): report (diff), errors, train, similarity.

Writes the fan-out sinks (``anomalies/``, ``reports/``, ``unknown/``) as
resumable partitioned Parquet with manifests plus a ``summary.json``
carrying the LineCounters parity totals (model.rs:451-470), and streams the
top anomalies to the console like the reference live mode
(cli/src/main.rs:721-830).

Only this CLI owns the Ray session (guarded init) — library code never
calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from .tuning import configure_data_context

    configure_data_context()


def _config_from_args(args) -> "PipelineConfig":
    from .config import PipelineConfig

    if getattr(args, "config", None):
        # user config file (YAML/JSON, config.rs:60-310): resolved against
        # --job-name (matcher configs, first match wins), then CLI flags
        # override the file
        from .config_file import load_config

        user = load_config(args.config)
        tc = user.get_target_config(getattr(args, "job_name", "") or "")
        cfg = tc.to_pipeline_config()
        args._target_config = tc
    else:
        cfg = PipelineConfig()
    if getattr(args, "ignore_pattern", None):
        cfg.ignore_patterns = cfg.ignore_patterns + list(args.ignore_pattern)
    if getattr(args, "keep_duplicate", False):
        # LOGJUICER_KEEP_DUPLICATE analog (config.rs:168-172)
        cfg.skip_duplicate = False
    if getattr(args, "sorted_input", False):
        cfg.sorted_input = True
    if getattr(args, "split_lines", False):
        if cfg.sorted_input:
            raise SystemExit("--split-lines is incompatible with --sorted-input")
        cfg.split_multiline_turns = True
    return cfg


def _is_url(path) -> bool:
    return bool(path) and (path.startswith("http://") or path.startswith("https://"))


def _fetcher_from_args(args):
    from .sources.remote import HttpFetcher, LocalMirrorFetcher

    mirror = getattr(args, "mirror", None)
    return LocalMirrorFetcher(mirror) if mirror else HttpFetcher()


def _error_collector(args):
    """Lazily-created shared read-error collector for this CLI run
    (sources/read_errors.py — report.rs:112 read_errors analog)."""
    ec = getattr(args, "_read_error_collector", None)
    if ec is None:
        from .sources.read_errors import new_read_error_collector

        ec = new_read_error_collector()
        args._read_error_collector = ec
    return ec


def _read_url(url, *, args, role: str = "file"):
    """Remote input: classify the URL (zuul build / prow view / httpdir
    directory / single file, urls.rs:10-22), discover its file list on
    the driver (metadata-plane), then read the files with one Ray task
    each (sources/remote.py)."""
    from .sources.remote import content_from_url, read_url_lines, sources_for_content

    fetcher = _fetcher_from_args(args)
    kind, obj = content_from_url(url, fetcher)
    prefix, files = sources_for_content(kind, obj, fetcher)
    return read_url_lines(
        files, prefix, fetcher,
        role=role, target_config=getattr(args, "_target_config", None),
        error_collector=_error_collector(args),
    )


def _discover_remote_baseline(url, args):
    """No --baseline/--model with a zuul/prow target URL: discover the
    best SUCCESS build of the same job to train on (the reference's
    auto-baseline flow, zuul.rs:156-176 / prow.rs:131-152)."""
    from .sources.remote import (
        content_from_url,
        read_url_lines,
        sources_for_content,
        zuul_discover_baselines,
        prow_discover_baselines,
    )

    fetcher = _fetcher_from_args(args)
    kind, obj = content_from_url(url, fetcher)
    if kind == "zuul":
        baselines = zuul_discover_baselines(obj, fetcher)
    elif kind == "prow":
        baselines = prow_discover_baselines(obj, fetcher)
    else:
        return None
    if not baselines:
        raise SystemExit(f"no baseline found for {url}")
    datasets = []
    for b in baselines:
        prefix, files = sources_for_content(kind, b, fetcher)
        datasets.append(
            read_url_lines(files, prefix, fetcher,
                           target_config=getattr(args, "_target_config", None))
        )
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    return ds


def _read_input(path, *, split, args, block_mib=None):
    """Dispatch an input path: turns parquet (the engine's native table),
    a tarball / directory of tarballs (source.rs:95-160 analog — each
    entry becomes a source grouped by its IndexName; the ``split`` column
    does not exist in archives, so split filters don't apply), or a
    remote URL (zuul/prow/httpdir)."""
    from .sources.transcripts import ENGINE_COLUMNS, read_turns

    if _is_url(path):
        return _read_url(path, args=args)
    if path and (
        _is_tarball_input(path)
        or (os.path.isdir(path) and _dir_has_tarballs(path))
    ):
        from .sources.archives import read_archive_lines

        return read_archive_lines(
            path, target_config=getattr(args, "_target_config", None),
            error_collector=_error_collector(args),
        )
    if path:
        from .sources.journal import is_journal_path

        if is_journal_path(path) or (
            os.path.isdir(path)
            and any(is_journal_path(f) for f in os.listdir(path))
        ):
            from .sources.journal import read_journal_lines

            return read_journal_lines(path)
    if path and _is_raw_path(path):
        # plain log file or directory of raw log files
        # (files.rs:12-22 content_from_path / :59-68 dir_iter analog)
        from .sources.rawfiles import read_file_lines

        return read_file_lines(
            path, target_config=getattr(args, "_target_config", None),
            error_collector=_error_collector(args),
        )
    return read_turns(path, split=split, columns=ENGINE_COLUMNS,
                      block_mib=block_mib)


def _is_raw_path(path: str) -> bool:
    """A local non-parquet file, or a directory containing no parquet
    parts (tarballs and journals are dispatched before this check)."""
    if os.path.isfile(path):
        return not path.endswith(".parquet")
    if os.path.isdir(path):
        return not any(f.endswith(".parquet") for f in os.listdir(path))
    return False


def _is_tarball_input(path: str) -> bool:
    from .sources.archives import is_tarball_path

    return is_tarball_path(path)


def _dir_has_tarballs(path: str) -> bool:
    from .sources.archives import is_tarball_path

    return any(is_tarball_path(f) for f in os.listdir(path))


def _apply_source_filter(ds, args):
    """includes/excludes from the config file filter sources by conv_id
    (is_source_valid, config.rs:207-209)."""
    tc = getattr(args, "_target_config", None)
    if tc is None or (not tc.includes and not tc.excludes):
        return ds
    from .config_file import source_valid_filter

    return source_valid_filter(ds, tc)


def _print_anomalies(anomalies_ds, limit: int = 50) -> None:
    shown = 0
    for row in anomalies_ds.iter_rows():
        if shown >= limit:
            print(f"... (truncated at {limit})")
            break
        for b in row["before"]:
            print(f"   | {b}")
        print(f"{row['distance']:.2f} {row['conv_id']}:{row['turn_idx']} | {row['text']}")
        for a in row["after"]:
            print(f"   | {a}")
        shown += 1


def _write_outputs(out, out_dir: str, *, inputs, extra_summary=None,
                   error_collector=None) -> dict:
    from .sinks import write_sink

    summary: dict = {"sinks": {}}
    for name in ("anomalies", "reports", "unknown"):
        if name in out:
            manifest = write_sink(out[name], os.path.join(out_dir, name), inputs=inputs)
            summary["sinks"][name] = manifest["rows"]
    # LineCounters parity: totals over the scan counters
    totals = {"total_line_count": 0, "total_anomaly_count": summary["sinks"].get("anomalies", 0)}
    if "scan" in out:
        import pyarrow.compute as pc

        for batch in out["scan"].iter_batches(batch_format="pyarrow"):
            mask = pc.equal(batch.column("row_type"), "counts")
            totals["total_line_count"] += int(
                pc.sum(batch.filter(mask).column("line_count")).as_py() or 0
            )
    summary.update(totals)
    if error_collector is not None:
        # drained AFTER the sinks executed the pipeline, so every skipped
        # source has reported by now (report.rs:112 read_errors parity)
        from .sources.read_errors import drain_read_errors

        summary["read_errors"] = [list(t)
                                  for t in drain_read_errors(error_collector)]
    if extra_summary:
        summary.update(extra_summary)
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def cmd_report(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.report import run_report
    from .pipelines.train import train
    from .sources.transcripts import ENGINE_COLUMNS, read_turns
    from .state.model import Model

    from .metrics import Metrics

    cfg = _config_from_args(args)
    metrics = Metrics()
    t0 = time.monotonic()
    if args.model and os.path.exists(os.path.join(args.model, "manifest.json")):
        model = Model.load(args.model)
    else:
        if not (args.baseline or args.input) and _is_url(args.target):
            baseline = _discover_remote_baseline(args.target, args)
            if baseline is None:
                raise SystemExit(f"--baseline required for {args.target}")
        elif (
            not (args.baseline or args.input)
            and args.target
            and os.path.isfile(args.target)
        ):
            # rotated-file baseline discovery (files.rs:25-31): the
            # implicit baseline of service.log is service.log.0
            from .sources.rawfiles import rotated_baseline_path

            rotated = rotated_baseline_path(args.target)
            if rotated is None:
                raise SystemExit(
                    f"no baseline: {args.target}.0 not found (pass --baseline)"
                )
            baseline = _read_input(rotated, split=args.baseline_split, args=args)
        else:
            baseline = _read_input(
                args.baseline or args.input, split=args.baseline_split, args=args
            )
        baseline = _apply_source_filter(baseline, args)
        model = train(baseline, cfg, metrics=metrics)
        if args.model:
            model.save(args.model)
    target = _apply_source_filter(
        _read_input(args.target or args.input, split=args.target_split, args=args), args
    )
    out = run_report(target, model, cfg, metrics=metrics)
    os.makedirs(args.out, exist_ok=True)
    metrics.write(args.out)
    summary = _write_outputs(
        out,
        args.out,
        inputs=[args.input or args.baseline, args.target],
        error_collector=getattr(args, "_read_error_collector", None),
        extra_summary={
            "groups": {k: v.index.nrows for k, v in sorted(model.indexes.items())},
            "run_time_s": round(time.monotonic() - t0, 2),
        },
    )
    if getattr(args, "bundle", None):
        from .report_codec import save_report_bundle

        save_report_bundle(out, args.bundle, meta={"summary": summary})
    if not args.quiet:
        _print_anomalies(out["anomalies"])
        print(json.dumps(summary))
    return 0


def cmd_errors(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.report import run_errors_report
    from .pipelines.train import train
    from .sources.transcripts import ENGINE_COLUMNS, read_turns
    from .state.model import Model

    cfg = _config_from_args(args)
    model = None
    if args.model and os.path.exists(os.path.join(args.model, "manifest.json")):
        model = Model.load(args.model)
    elif args.baseline or (args.input and args.baseline_split):
        # errors-with-model needs a baseline SOURCE: an explicit --baseline
        # or a --input table carrying the baseline split.  A --target-only
        # run (e.g. a single .journal file) scans without a model.
        baseline = _apply_source_filter(
            _read_input(args.baseline or args.input, split=args.baseline_split, args=args), args
        )
        model = train(baseline, cfg)
    from .sources.transcripts import ERRORS_BLOCK_MIB

    target = _apply_source_filter(
        _read_input(args.target or args.input, split=args.target_split,
                    args=args, block_mib=ERRORS_BLOCK_MIB), args
    )
    from .metrics import Metrics

    metrics = Metrics()
    out = run_errors_report(target, cfg, model=model, metrics=metrics)
    os.makedirs(args.out, exist_ok=True)
    metrics.write(args.out)
    summary = _write_outputs(
        out, args.out, inputs=[args.input or args.target],
        error_collector=getattr(args, "_read_error_collector", None),
    )
    if getattr(args, "bundle", None):
        from .report_codec import save_report_bundle

        save_report_bundle(out, args.bundle, kind="errors",
                           meta={"summary": summary})
    if not args.quiet:
        _print_anomalies(out["anomalies"])
        print(json.dumps(summary))
    return 0


def cmd_train(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.train import train
    from .sources.transcripts import ENGINE_COLUMNS, read_turns

    cfg = _config_from_args(args)
    baseline = _read_input(args.input, split=args.baseline_split, args=args)
    model = train(baseline, cfg)
    model.save(args.model)
    if not args.quiet:
        print(
            json.dumps(
                {"groups": {k: v.index.nrows for k, v in sorted(model.indexes.items())}}
            )
        )
    return 0


def cmd_similarity(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.report import run_report
    from .pipelines.similarity import create_similarity
    from .pipelines.train import train
    from .sinks import write_sink
    from .sources.transcripts import ENGINE_COLUMNS, read_turns

    cfg = _config_from_args(args)
    if getattr(args, "from_reports", None):
        # consume SAVED reports (sink dirs or bundle files) instead of
        # recomputing each target's report
        anomalies = [_load_saved_report(d)["anomalies"]
                     for d in args.from_reports]
    else:
        # reference flow (cli/src/main.rs:463-513): train on the first
        # target's baselines, one report per target, then the merge
        baseline = read_turns(args.inputs[0], split="baseline", columns=ENGINE_COLUMNS)
        model = train(baseline, cfg)
        anomalies = []
        for path in args.inputs:
            target = read_turns(path, split="target", columns=ENGINE_COLUMNS)
            anomalies.append(run_report(target, model, cfg)["anomalies"])
    sim = create_similarity(anomalies)
    os.makedirs(args.out, exist_ok=True)
    manifest = write_sink(
        sim,
        os.path.join(args.out, "similarity"),
        inputs=list(getattr(args, "from_reports", None) or args.inputs or []),
    )
    if getattr(args, "bundle", None):
        # SimilarityReport::save analog (report.rs:240-255): the merged
        # matrix as one binary artifact
        from .report_codec import save_report_bundle

        save_report_bundle({"similarity": sim}, args.bundle,
                           kind="similarity",
                           meta={"similarity_rows": manifest["rows"]})
    if not args.quiet:
        print(json.dumps({"similarity_rows": manifest["rows"]}))
    return 0


def cmd_zuul_build(args) -> int:
    """In-CI mode (``logjuicer zuul-build LOG_ROOT --api-url URL``,
    model.rs:344-355): the target is the LOCAL build directory (the
    executor's log_root, walked like any raw dir); the build identity
    comes from ``zuul-info/inventory.yaml``; baselines are discovered
    through the Zuul API and read remotely."""
    _init_ray(args.num_cpus)
    from .pipelines.report import run_report
    from .pipelines.train import train
    from .sources.rawfiles import read_file_lines
    from .sources.remote import (
        read_url_lines,
        zuul_build_from_inventory,
        zuul_discover_baselines,
        zuul_sources,
    )

    inv_path = os.path.join(args.log_root, "zuul-info", "inventory.yaml")
    with open(inv_path) as f:
        build = zuul_build_from_inventory(args.api_url, f.read())
    if not getattr(args, "job_name", ""):
        # config matchers resolve against the build's own job name
        args.job_name = build.job_name
    cfg = _config_from_args(args)
    fetcher = _fetcher_from_args(args)
    baselines = zuul_discover_baselines(build, fetcher)
    if not baselines:
        raise SystemExit(f"no baseline found for {build.job_name}")
    tc = getattr(args, "_target_config", None)
    datasets = []
    for b in baselines:
        prefix, files = zuul_sources(b, fetcher)
        datasets.append(read_url_lines(files, prefix, fetcher, target_config=tc))
    baseline_ds = datasets[0]
    for other in datasets[1:]:
        baseline_ds = baseline_ds.union(other)
    model = train(_apply_source_filter(baseline_ds, args), cfg)
    target = _apply_source_filter(read_file_lines(args.log_root, target_config=tc), args)
    out = run_report(target, model, cfg)
    os.makedirs(args.out, exist_ok=True)
    summary = _write_outputs(
        out, args.out,
        inputs=[args.log_root] + [b.log_url for b in baselines],
        extra_summary={"baselines": [b.uuid for b in baselines]},
    )
    if not args.quiet:
        _print_anomalies(out["anomalies"])
        print(json.dumps(summary))
    return 0


def cmd_download_logs(args) -> int:
    """``logjuicer download-logs DEST URL`` (cli/src/downloader.rs:21-37):
    resolve the url's source list, then fetch each file to
    ``DEST/<relative path>`` with a small worker pool (local-disk fan-in —
    a single-node utility by construction, like the reference's
    ThreadPool(5))."""
    from concurrent.futures import ThreadPoolExecutor
    from urllib.parse import unquote

    from .sources.remote import content_from_url, sources_for_content

    fetcher = _fetcher_from_args(args)
    kind, obj = content_from_url(args.url, fetcher)
    prefix, files = sources_for_content(kind, obj, fetcher)

    def fetch_one(url: str) -> str | None:
        data = fetcher.get(url)
        if data is None:
            return None
        path = os.path.join(args.dest, unquote(url[prefix:]))
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        if not args.quiet:
            print(f"Fetching {url} to {path}")
        return path

    with ThreadPoolExecutor(max_workers=5) as pool:
        written = [p for p in pool.map(fetch_one, files) if p]
    if not args.quiet:
        print(json.dumps({"files": len(written)}))
    return 0


def cmd_check_model(args) -> int:
    """``logjuicer check-model --model DIR [--max-age DAYS]``
    (cli/src/main.rs:285-320): exit 1 when the model is unreadable or
    older than the given age."""
    from .state.model import Model

    try:
        model = Model.load(args.model)
    except Exception as e:
        print(f"invalid model: {e}", file=sys.stderr)
        return 1
    if args.max_age is not None:
        if model.is_stale([], max_age_s=args.max_age * 86400.0):
            print(f"model is older than {args.max_age} days", file=sys.stderr)
            return 1
    if not args.quiet:
        print(
            json.dumps(
                {
                    "created_at": model.created_at,
                    "groups": {k: v.index.nrows for k, v in sorted(model.indexes.items())},
                }
            )
        )
    return 0


def _load_saved_report(path: str) -> dict:
    """Dispatch a saved-report path: a sink DIRECTORY loads via the
    parquet manifests (load_report), a FILE is a single-artifact bundle
    (report_codec, the report.rs:214-237 load analog — .gz handled)."""
    if os.path.isfile(path):
        from .report_codec import load_report_bundle

        return load_report_bundle(path)
    from .pipelines.report import load_report

    return load_report(path)


def cmd_read_report(args) -> int:
    """``logjuicer read-report DIR|FILE`` (main.rs ReadReport): print a
    saved report's anomalies from a sink dir or a bundle file."""
    _init_ray(args.num_cpus)
    from .report_codec import BundleError

    try:
        rep = _load_saved_report(args.dir)
    except (FileNotFoundError, BundleError) as e:
        print(str(e), file=sys.stderr)
        return 1
    if not args.quiet:
        _print_anomalies(rep["anomalies"])
        print(json.dumps({name: ds.count() for name, ds in rep.items()
                          if hasattr(ds, "count")}))
    return 0


def cmd_filter_report(args) -> int:
    """``logjuicer filter-report`` (main.rs:707-719, filter.rs:150-166):
    drop target-report anomalies already present in baseline reports.
    Baseline anomaly lines build one token index per IndexName
    (filter.rs:15-31); each target conversation re-scores against its
    group's index (ansible sources also check the before-context)."""
    _init_ray(args.num_cpus)
    from .filtering import filter_anomalies, is_ansible_conv
    from .index_name import group_key
    from .sinks import write_sink
    from .tokenizer import process as tokenize
    from .vectorize import build_index

    import pyarrow as pa

    # 1. index the baseline reports' anomaly lines per group
    tokens_by_key: dict[str, list[str]] = {}
    for d in args.baselines:
        try:
            rep = _load_saved_report(d)
        except FileNotFoundError:
            continue  # baseline report had no anomalies: nothing to index
        for row in rep["anomalies"].iter_rows():
            key = group_key(row["role"], row["tool"])
            tokens_by_key.setdefault(key, []).append(tokenize(row["text"]))
    indexes = {k: build_index(v) for k, v in tokens_by_key.items()}

    # 2. re-score the target's anomalies conversation by conversation
    target = _load_saved_report(args.target_report)
    if "anomalies" not in target:
        raise SystemExit(f"no anomalies sink under {args.target_report}")
    by_conv: dict[str, list[dict]] = {}
    for row in target["anomalies"].iter_rows():
        by_conv.setdefault(row["conv_id"], []).append(row)
    kept: list[dict] = []
    for conv, rows in sorted(by_conv.items()):
        index = indexes.get(group_key(rows[0]["role"], rows[0]["tool"]))
        if index is None:
            kept.extend(rows)  # no baseline for this group: keep everything
        else:
            kept.extend(
                filter_anomalies(index, rows, check_before=is_ansible_conv(conv))
            )

    os.makedirs(args.out, exist_ok=True)
    import ray.data as rd

    schema = pa.schema(
        zip(target["anomalies"].schema().names, target["anomalies"].schema().types)
    )
    if kept:
        table = pa.table(
            {n: pa.array([r[n] for r in kept], schema.field(n).type) for n in schema.names}
        )
    else:
        table = schema.empty_table()
    manifest = write_sink(
        rd.from_arrow(table), os.path.join(args.out, "anomalies"),
        inputs=[args.target_report] + list(args.baselines),
    )
    total = sum(len(v) for v in by_conv.values())
    if not args.quiet:
        print(json.dumps({"kept": manifest["rows"], "dropped": total - manifest["rows"]}))
    return 0


def cmd_http_ls(args) -> int:
    """``logjuicer http-ls URL`` (main.rs:329-333): print every file url
    under an autoindex tree (request cap 20000 like the reference)."""
    from .sources.remote import httpdir_list

    files, errors = httpdir_list(args.url, _fetcher_from_args(args), request_max=20000)
    for f in files:
        print(f)
    for e in errors:
        print(e, file=sys.stderr)
    return 1 if errors else 0


def cmd_debug_groups(args) -> int:
    """``logjuicer debug-groups`` (main.rs DebugGroups): per-group line
    counts of a target input."""
    _init_ray(args.num_cpus)
    from .index_name import group_key

    ds = _read_input(args.target, split=args.target_split, args=args)
    counts = ds.groupby(["role", "tool"]).count().take_all()
    for row in sorted(counts, key=lambda r: (r["role"], r["tool"])):
        print(f"{group_key(row['role'], row['tool'])}: {row['count()']}")
    return 0


def cmd_debug_iterator(args) -> int:
    """``logjuicer debug-iterator PATH`` (main.rs:346-366): print every
    source under a raw path (file / dir / tarball) as ``[source]`` headers
    followed by ``ordinal | text`` lines — shows exactly what the line
    iterator feeds the tokenizer (sub-line splits, decompression, tarball
    entries).  Debug utility: materializes on the driver by design."""
    _init_ray(args.num_cpus)
    from .sources.rawfiles import read_file_lines

    ds = read_file_lines(args.path)
    prev = None
    for row in ds.sort(["conv_id", "turn_idx"]).iter_rows():
        if row["conv_id"] != prev:
            prev = row["conv_id"]
            print(f"[{prev}]")
        print(f"{row['turn_idx']} | {row['text']}")
    return 0


def cmd_debug_tokenizer(args) -> int:
    from .tokenizer import process as tokenize

    print(tokenize(args.line))
    return 0


def cmd_debug_indexname(args) -> int:
    from .index_name import index_name_from_path

    print(index_name_from_path(args.path))
    return 0


def cmd_debug_model(args) -> int:
    return cmd_check_model(args)


def cmd_debug_config(args) -> int:
    """``logjuicer debug-config JOB FILE LINE`` (main.rs DebugConfig):
    show what the matched config decides for a file path and a line."""
    from .config_file import load_config

    user = load_config(args.config)
    tc = user.get_target_config(args.job)
    print(
        json.dumps(
            {
                "file_valid": tc.is_fp_valid(args.file),
                "line_ignored": tc.is_ignored_line(args.line),
            }
        )
    )
    return 0


def cmd_test(args) -> int:
    """Dataset conformance verb (``logjuicer test DIR...``,
    cli/src/dataset.rs:39-78): exit 1 when any dataset fails."""
    _init_ray(args.num_cpus)
    from .dataset_test import test_datasets

    # With no explicit config flags, pass None so each dataset dir's own
    # config.yaml (per-job matcher analog, config.rs:224-310) drives its
    # run; explicit --config/--ignore-pattern/--keep-duplicate override
    # for every dir, matching the CLI's other verbs.
    explicit = bool(
        getattr(args, "config", None)
        or getattr(args, "ignore_pattern", None)
        or getattr(args, "keep_duplicate", False)
    )
    cfg = _config_from_args(args) if explicit else None
    failures = test_datasets(list(args.paths), cfg, quiet=args.quiet)
    return 1 if failures else 0


def main(argv=None) -> int:
    parent = argparse.ArgumentParser(add_help=False)
    parent.add_argument("--num-cpus", type=int, default=None)
    parent.add_argument("--quiet", action="store_true")
    p = argparse.ArgumentParser(prog="logjuicer-ray", parents=[parent])
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--input", help="turns parquet with a split column")
        sp.add_argument("--baseline", help="baseline turns parquet")
        sp.add_argument("--target", help="target turns parquet")
        sp.add_argument("--baseline-split", default="baseline")
        sp.add_argument("--target-split", default="target")
        sp.add_argument("--model", help="model dir to load/save")
        sp.add_argument("--out", required=True)
        sp.add_argument("--ignore-pattern", action="append")
        sp.add_argument("--keep-duplicate", action="store_true")
        sp.add_argument("--config", help="user config file (.yaml/.json)")
        sp.add_argument("--job-name", default="", help="job name matched against the config file's matcher entries")
        sp.add_argument(
            "--mirror",
            help="serve http(s):// inputs from this local directory tree "
                 "(root/<host>/<path>) instead of the network",
        )
        sp.add_argument(
            "--sorted-input",
            action="store_true",
            help="input parquet is globally sorted by (conv_id, turn_idx): "
                 "scan per block with boundary repair instead of a full shuffle",
        )
        sp.add_argument(
            "--split-lines",
            action="store_true",
            help="treat embedded newlines in a turn's text as record "
                 "boundaries (BytesLines parity); turn_idx becomes the "
                 "per-conversation line ordinal",
        )
        sp.add_argument(
            "--bundle",
            help="also save the report as ONE binary bundle file "
                 "(Arrow-IPC sections + zstd; .gz suffix gzips the whole "
                 "container — the report.rs:198-237 single-artifact analog)",
        )

    sp = sub.add_parser("report", parents=[parent], help="diff target against baseline (logjuicer diff analog)")
    common(sp)
    sp.set_defaults(fn=cmd_report)

    sp = sub.add_parser("errors", parents=[parent], help="extract error anomalies (logjuicer errors analog)")
    common(sp)
    sp.set_defaults(fn=cmd_errors)

    sp = sub.add_parser("train", parents=[parent], help="train and save a model")
    sp.add_argument("--input", required=True)
    sp.add_argument("--baseline-split", default="baseline")
    sp.add_argument("--model", required=True)
    sp.add_argument("--ignore-pattern", action="append")
    sp.add_argument("--keep-duplicate", action="store_true")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("similarity", parents=[parent], help="cross-target anomaly co-occurrence")
    sp.add_argument("--inputs", nargs="+")
    sp.add_argument(
        "--from-reports",
        nargs="+",
        help="saved reports (sink dirs or bundle files) to merge instead of recomputing",
    )
    sp.add_argument("--out", required=True)
    sp.add_argument(
        "--bundle",
        help="also save the similarity matrix as ONE binary bundle file "
             "(SimilarityReport::save analog, report.rs:240-255)",
    )
    sp.add_argument("--ignore-pattern", action="append")
    sp.add_argument("--keep-duplicate", action="store_true")
    sp.set_defaults(fn=cmd_similarity)

    sp = sub.add_parser("zuul-build", parents=[parent], help="in-CI mode: local log_root target, API-discovered baseline")
    sp.add_argument("log_root", help="the zuul.executor.log_root directory")
    sp.add_argument("--api-url", required=True, help="Zuul API url to fetch baselines")
    sp.add_argument("--out", required=True)
    sp.add_argument("--mirror")
    sp.add_argument("--ignore-pattern", action="append")
    sp.add_argument("--keep-duplicate", action="store_true")
    sp.add_argument("--config", help="user config file (.yaml/.json)")
    sp.add_argument("--job-name", default="")
    sp.set_defaults(fn=cmd_zuul_build)

    sp = sub.add_parser("download-logs", parents=[parent], help="download a url's files to a directory")
    sp.add_argument("dest")
    sp.add_argument("url")
    sp.add_argument("--mirror")
    sp.set_defaults(fn=cmd_download_logs)

    sp = sub.add_parser("check-model", parents=[parent], help="validate a pre-built model")
    sp.add_argument("--model", required=True)
    sp.add_argument("--max-age", type=float, help="maximum model age in days")
    sp.set_defaults(fn=cmd_check_model)

    sp = sub.add_parser("read-report", parents=[parent], help="print a saved report's anomalies")
    sp.add_argument("dir")
    sp.set_defaults(fn=cmd_read_report)

    sp = sub.add_parser("filter-report", parents=[parent], help="drop target anomalies present in baseline reports")
    sp.add_argument("--baselines", nargs="+", required=True, help="saved baseline report dirs")
    sp.add_argument("--target-report", required=True, help="saved target report dir")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_filter_report)

    sp = sub.add_parser("http-ls", parents=[parent], help="list httpdir urls")
    sp.add_argument("url")
    sp.add_argument("--mirror")
    sp.set_defaults(fn=cmd_http_ls)

    sp = sub.add_parser("debug-groups", parents=[parent], help="per-group line counts of a target")
    sp.add_argument("--target", required=True)
    sp.add_argument("--target-split", default="target")
    sp.add_argument("--mirror")
    sp.set_defaults(fn=cmd_debug_groups)

    sp = sub.add_parser("debug-iterator", parents=[parent], help="print a raw path's line-iterator output")
    sp.add_argument("path")
    sp.set_defaults(fn=cmd_debug_iterator)

    sp = sub.add_parser("debug-tokenizer", parents=[parent], help="tokenize a single line")
    sp.add_argument("line")
    sp.set_defaults(fn=cmd_debug_tokenizer)

    sp = sub.add_parser("debug-indexname", parents=[parent], help="index name of a path")
    sp.add_argument("path")
    sp.set_defaults(fn=cmd_debug_indexname)

    sp = sub.add_parser("debug-model", parents=[parent], help="print a saved model's manifest")
    sp.add_argument("--model", required=True)
    sp.add_argument("--max-age", type=float)
    sp.set_defaults(fn=cmd_debug_model)

    sp = sub.add_parser("debug-config", parents=[parent], help="what the matched config decides for a file and line")
    sp.add_argument("job")
    sp.add_argument("file")
    sp.add_argument("line")
    sp.add_argument("--config", required=True)
    sp.set_defaults(fn=cmd_debug_config)

    sp = sub.add_parser("test", parents=[parent], help="validate good/fail dataset dirs (logjuicer test analog)")
    sp.add_argument("paths", nargs="+", help="dataset directories (*.good, *.fail, inf.yaml)")
    sp.add_argument("--ignore-pattern", action="append")
    sp.add_argument("--keep-duplicate", action="store_true")
    sp.add_argument("--config", help="user config file (.yaml/.json)")
    sp.add_argument("--job-name", default="")
    sp.set_defaults(fn=cmd_test)

    args = p.parse_args(argv)
    import ray

    # Only tear down a Ray session this invocation created: shutting down a
    # pre-existing session would invalidate the caller's live object refs
    # (e.g. a test harness or notebook that owns the session).
    owns_session = not ray.is_initialized()
    rc = args.fn(args)
    if owns_session and ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
