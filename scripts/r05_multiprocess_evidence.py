#!/usr/bin/env python
"""Round-5 multiprocess evidence: re-run the three tiny dryrun modes at
round-4 scale plus the NEW --body resnet train mode (VERDICT r4 item 9),
combining the four JSON lines into /root/repo/MULTIPROCESS_r05.json."""
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
ENV.pop("XLA_FLAGS", None)

RUNS = [
    ("train", ["--mode", "train", "--num_processes", "4",
               "--local_devices", "2", "--steps", "2"]),
    ("resume", ["--mode", "resume", "--num_processes", "2",
                "--local_devices", "2", "--steps", "2"]),
    ("eval", ["--mode", "eval", "--num_processes", "2",
              "--local_devices", "1"]),
    ("train_resnet_body", ["--mode", "train", "--body", "resnet",
                           "--num_processes", "2", "--local_devices", "1",
                           "--steps", "1"]),
]

out = {}
ok = True
for name, args in RUNS:
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_dryrun.py")]
        + args, env=ENV, cwd=REPO, capture_output=True, text=True,
        timeout=7200,
    )
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
    try:
        rec = json.loads(line)
    except ValueError:
        rec = {"ok": False, "raw": line[-300:]}
    rec["wall_s"] = round(time.time() - t0, 1)
    rec["rc"] = r.returncode
    ok &= r.returncode == 0 and rec.get("ok", False)
    out[name] = rec
    print(json.dumps({name: rec}), flush=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-2000:])

out["ok"] = ok
with open(os.path.join(REPO, "MULTIPROCESS_r05.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({"ok": ok}), flush=True)
sys.exit(0 if ok else 1)
