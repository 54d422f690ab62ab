#!/usr/bin/env python3
"""Ingest-seam scaling-knee bench: 1/2/4/8 SeamWorker consumer JVMs
draining one shared blob store + FileLeaseQueue into one shared table.

Per point: a producer JVM spools BATCHES x ROWS NDJSON rows into the
shared LocalBlobStore, the stop flag drops, then W consumer JVMs race
the claim queue until the store drains. Every consumer stdout line is
wall-clock-timestamped at arrival, giving per-batch CLAIMED/INGESTED
spans to derive:

  - steady rows/s: rows ingested after EVERY worker finished its first
    batch (the r17 steady-state definition - a resident fleet amortizes
    the one-time per-JVM codegen warm-up), over that window;
  - claim-wait fraction: 1 - (sum of CLAIMED->INGESTED busy spans
    inside the steady window) / (workers x window) - the share of
    steady-state worker-time NOT spent ingesting, i.e. claim-queue
    acquisition + sweep polling + drain-tail idling.

Exactly-once is asserted per point: every worker's final DONE row
count must equal BATCHES x ROWS exactly.

Usage: python3 scripts/seam_knee.py [outJson]
Writes INGEST_SEAM json (default /tmp/seam_knee.json).
"""
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCHES = 60
ROWS = 20000

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def java_cmd(*args):
    cp = f"{REPO}/target/scala-2.13/classes:" + ":".join(
        sorted(glob.glob("/opt/spark/jars/*.jar")))
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Xmx4g", "-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC", "-cp", cp,
            "graft.SeamWorker", *args]
    return cmd


def run_consumer(shared, tag, events, done, procs=None):
    proc = subprocess.Popen(java_cmd("consume", shared, tag),
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    if procs is not None:
        procs[tag] = proc
    for line in proc.stdout:
        t = time.monotonic()
        line = line.strip()
        if line.startswith(("CLAIMED", "INGESTED", "DONE")):
            events.append((t, tag, line))
        if line.startswith("DONE"):
            done[tag] = int(line.split("rows=")[1])
    proc.wait()


def one_point(workers):
    shared = tempfile.mkdtemp(prefix=f"graft-knee-{workers}w-")
    try:
        subprocess.run(java_cmd("produce", shared, str(BATCHES), str(ROWS)),
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        open(f"{shared}/stop", "w").close()  # drain-then-exit
        events, done = [], {}
        threads = [threading.Thread(
            target=run_consumer, args=(shared, f"w{i}", events, done))
            for i in range(workers)]
        t0 = time.monotonic()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.monotonic() - t0

        for tag, rows in done.items():
            assert rows == BATCHES * ROWS, \
                f"{workers}w {tag}: rows={rows} != {BATCHES * ROWS} (exactly-once broken)"

        # pair CLAIMED/INGESTED per (worker, file)
        claims, spans = {}, []  # spans: (t_claim, t_ingest, tag, file)
        for t, tag, line in sorted(events):
            parts = line.split()
            if parts[0] == "CLAIMED":
                claims[(tag, parts[1])] = t
            elif parts[0] == "INGESTED":
                f = parts[1]
                c = claims.pop((tag, f), None)
                if c is not None:
                    spans.append((c, t, tag, f))
        spans.sort()
        # steady window: after every worker's FIRST ingest completes
        firsts = {}
        for c, t, tag, f in spans:
            firsts.setdefault(tag, t)
        t_warm = max(firsts.values())
        t_end = max(t for _, t, _, _ in spans)
        steady = [s for s in spans if s[1] > t_warm]
        steady_rows = len(steady) * ROWS
        window = t_end - t_warm
        rps = steady_rows / window if window > 0 else float("nan")
        # busy time inside the steady window, clamped to it
        busy = sum(min(t, t_end) - max(c, t_warm)
                   for c, t, _, _ in spans if t > t_warm)
        wait_frac = 1.0 - busy / (workers * window) if window > 0 else float("nan")
        per_worker = {tag: sum(1 for s in spans if s[2] == tag) for tag in done}
        return {"rows_per_sec_steady": round(rps), "full_drain_s": round(wall, 2),
                "steady_window_s": round(window, 2), "steady_batches": len(steady),
                "claim_wait_frac": round(wait_frac, 3),
                "batches_per_worker": per_worker}
    finally:
        shutil.rmtree(shared, ignore_errors=True)


def chaos_point(workers=4, kill_after_batches=15):
    """kill -9 one of `workers` consumers mid-drain; assert exactly-once
    (every SURVIVOR's DONE equals the produced count — the victim's
    claimed-but-unfinished batch must be stolen after the 3 s lease TTL)
    and report the dip/recovery: throughput before the kill, the stall
    (max inter-ingest gap after the kill ~= lease TTL when a claim was
    stranded), and throughput after."""
    shared = tempfile.mkdtemp(prefix="graft-chaos-4w-")
    try:
        subprocess.run(java_cmd("produce", shared, str(BATCHES), str(ROWS)),
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        open(f"{shared}/stop", "w").close()
        events, done, procs = [], {}, {}
        victim = "w3"
        threads = [threading.Thread(
            target=run_consumer, args=(shared, f"w{i}", events, done, procs))
            for i in range(workers)]
        for th in threads:
            th.start()
        # kill the victim once the fleet is mid-drain
        t_kill = None
        while t_kill is None:
            time.sleep(0.1)
            ing = sum(1 for _, _, l in list(events) if l.startswith("INGESTED"))
            if ing >= kill_after_batches and victim in procs:
                procs[victim].kill()
                t_kill = time.monotonic()
        for th in threads:
            th.join()
        survivors = {t: r for t, r in done.items() if t != victim}
        assert survivors and all(r == BATCHES * ROWS for r in survivors.values()), \
            f"chaos: survivor counts {survivors} != {BATCHES * ROWS} (exactly-once broken)"
        ing_times = sorted(t for t, _, l in events if l.startswith("INGESTED"))
        pre = [t for t in ing_times if t <= t_kill]
        post = [t for t in ing_times if t > t_kill]
        gaps = [b - a for a, b in zip(post, post[1:])]
        stall = round(max([post[0] - t_kill] + gaps), 2) if post else None
        def rps(ts):
            return round(len(ts) * ROWS / (ts[-1] - ts[0])) if len(ts) > 1 else None
        victim_unfinished = sum(
            1 for t, tag, l in events
            if tag == victim and l.startswith("CLAIMED")) - sum(
            1 for t, tag, l in events
            if tag == victim and l.startswith("INGESTED"))
        return {"workers": workers, "killed": victim,
                "batches_before_kill": len(pre), "batches_after_kill": len(post),
                "victim_stranded_claims": victim_unfinished,
                "rows_per_sec_pre_kill": rps(pre), "rows_per_sec_post_kill": rps(post),
                "max_post_kill_gap_s": stall,
                "survivor_rows": {t: r for t, r in survivors.items()}}
    finally:
        shutil.rmtree(shared, ignore_errors=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--chaos":
        res = chaos_point()
        print(json.dumps(res))
        return
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/seam_knee.json"
    points = {}
    for w in (1, 2, 4, 8):
        points[str(w)] = one_point(w)
        print(f"{w} workers: {points[str(w)]}", file=sys.stderr)
    r1 = points["1"]["rows_per_sec_steady"]
    result = {
        "metric": "seam_ingest_scaling_knee",
        "batch_rows": ROWS, "batches": BATCHES,
        "workers": points,
        "scaling_2w": round(points["2"]["rows_per_sec_steady"] / r1, 2),
        "scaling_4w": round(points["4"]["rows_per_sec_steady"] / r1, 2),
        "scaling_8w": round(points["8"]["rows_per_sec_steady"] / r1, 2),
        "note": ("steady-state excludes every worker JVM's first batch "
                 "(one-time codegen warm-up); claim_wait_frac is the share "
                 "of steady worker-time not spent inside an ingest span "
                 "(claim acquisition + sweep poll + drain-tail idle); "
                 "exactly-once asserted per point (every DONE equals the "
                 "produced row count)"),
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
