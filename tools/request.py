#!/usr/bin/env python3
"""HTTP client example / smoke test (port of /root/reference/tools/request.js).

POSTs an input.json to /input/:circuit, then polls GET /status until the
prover leaves "busy" (tools/request.js:37-45), printing the result.

Usage: python tools/request.py <input.json> <circuit> [host:port]
"""

import json
import sys
import time
import urllib.request

DEFAULT_ADDR = "127.0.0.1:9080"  # tools/request.js:8 hardcodes 9080


def call_input(base: str, input_path: str, circuit: str) -> None:
    with open(input_path, "rb") as f:
        body = f.read()
    req = urllib.request.Request(f"{base}/input/{circuit}", data=body,
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        r.read()


def get_status(base: str) -> dict:
    with urllib.request.urlopen(f"{base}/status") as r:
        return json.loads(r.read())


def run(input_path: str, circuit: str, addr: str = DEFAULT_ADDR) -> dict:
    base = f"http://{addr}"
    call_input(base, input_path, circuit)
    while True:
        st = get_status(base)
        if st.get("status") != "busy":
            return st
        time.sleep(0.1)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.stderr.write(
            "Usage: python tools/request.py <input.json> <circuit> "
            "[host:port]\n")
        sys.exit(1)
    addr = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_ADDR
    result = run(sys.argv[1], sys.argv[2], addr)
    print(json.dumps(result, indent=1))
    sys.exit(0 if result.get("status") == "success" else 2)
