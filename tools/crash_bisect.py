"""Streamed-path worker-fault bisect driver (docs/performance.md
"Single-chip 1080P-81f", memory note tpu-worker-crash-131k).

Known state entering r3: the 14B int4 131,040-token forward with all
three streams (attn_head_chunk 8 + cross_attn_chunk + ffn_chunk)
compiles and fits 13.8/15.75 GB but faults the TPU worker at EXECUTE;
reproduced at 720P with the same streams, so the fault is in the
streamed constructs, not the sequence length. FFN-only streaming is
exonerated (the 720P bench headline runs it). Suspected constructs:

  A. `_self_attention_streamed` — Pallas flash kernel driven by
     dynamic-sliced (int4-packed) weights inside a fori_loop, o-proj
     streamed through `_stream_residual` (nested fori + in-place
     dynamic_update_slice carry);
  B. chunked cross-attention — `_token_stream` (fori + DUS carry)
     around the Pallas kernel with Lk=512.

The ladder below discriminates construct vs scale vs quant cheaply
(1.3B compiles in minutes; every crash wedges the worker 30-60 min, so
each rung is one subprocess, health-gated, and logs its verdict).

Usage:
    python tools/crash_bisect.py --rung E1      # run one rung
    python tools/crash_bisect.py --list
"""

import argparse
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

# each rung: (name, what it discriminates, fwd_probe argv)
RUNGS = {
    # all streams at 1.3B/480p, int4 — does the fault reproduce small?
    "E1": ("1.3B int4 + head/cross/ffn streams @ 32,760",
           ["--task", "t2v-1.3B", "--size", "480*832", "--frames", "81",
            "--quant", "int4", "--residual_dtype", "bfloat16",
            "--attn_head_chunk", "4", "--cross_attn_chunk", "8192",
            "--ffn_chunk", "8192"]),
    # quant axis: same streams, bf16 weights
    "E2": ("1.3B bf16 + head/cross/ffn streams (quant discriminator)",
           ["--task", "t2v-1.3B", "--size", "480*832", "--frames", "81",
            "--quant", "none", "--residual_dtype", "bfloat16",
            "--attn_head_chunk", "4", "--cross_attn_chunk", "8192",
            "--ffn_chunk", "8192"]),
    # streamed-o axis: head groups accumulate, whole o-projection
    "E3": ("1.3B int4 streams, attn_o_stream=False (streamed-o discriminator)",
           ["--task", "t2v-1.3B", "--size", "480*832", "--frames", "81",
            "--quant", "int4", "--residual_dtype", "bfloat16",
            "--attn_head_chunk", "4", "--cross_attn_chunk", "8192",
            "--ffn_chunk", "8192", "--no_attn_o_stream"]),
    # head-group axis: cross+ffn streams only
    "E4": ("1.3B int4 cross+ffn streams only (head-group discriminator)",
           ["--task", "t2v-1.3B", "--size", "480*832", "--frames", "81",
            "--quant", "int4", "--residual_dtype", "bfloat16",
            "--cross_attn_chunk", "8192", "--ffn_chunk", "8192"]),
    # kernel axis: all streams but XLA attention (no Pallas in loops)
    "E5": ("1.3B int4 streams with attn_backend=xla (Pallas discriminator)",
           ["--task", "t2v-1.3B", "--size", "480*832", "--frames", "81",
            "--quant", "int4", "--residual_dtype", "bfloat16",
            "--attn_head_chunk", "4", "--cross_attn_chunk", "8192",
            "--ffn_chunk", "8192", "--attn_backend", "chunked"]),
    # 14B 720P with cross+ffn only (the memory note's named next rung;
    # ~16 min compile — run mem_probe --compile first to cache it)
    "E6": ("14B int4 720P cross+ffn streams only (no head chunk)",
           ["--task", "t2v-14B", "--size", "1280*720", "--frames", "81",
            "--quant", "int4", "--residual_dtype", "bfloat16",
            "--cross_attn_chunk", "16384", "--ffn_chunk", "16384"]),
    # 14B 720P all streams, o-stream off (fits at 720P, not at 131k)
    "E7": ("14B int4 720P streams, attn_o_stream=False",
           ["--task", "t2v-14B", "--size", "1280*720", "--frames", "81",
            "--quant", "int4", "--residual_dtype", "bfloat16",
            "--attn_head_chunk", "8", "--cross_attn_chunk", "16384",
            "--ffn_chunk", "16384", "--no_attn_o_stream"]),
    # the 131k headline attempt (only after a fix hypothesis survives
    # the cheaper rungs)
    "E8": ("14B int4 1920x832 all streams — the headline config",
           ["--task", "t2v-14B", "--size", "1920*832", "--frames", "81",
            "--quant", "int4", "--residual_dtype", "bfloat16",
            "--attn_head_chunk", "8", "--cross_attn_chunk", "16384",
            "--attn_o_chunk", "16384", "--ffn_chunk", "16384"]),
    # ---- r4 rungs: stream_impl=unroll (python loops + static slices)
    # avoids both suspect constructs (Pallas inside fori; dynamic-sliced
    # int4 weights). E9 cheap reproducer, E10 mid-scale, E11 headline.
    "E9": ("1.3B int4 all streams, stream_impl=unroll",
           ["--task", "t2v-1.3B", "--size", "480*832", "--frames", "81",
            "--quant", "int4", "--residual_dtype", "bfloat16",
            "--attn_head_chunk", "4", "--cross_attn_chunk", "8192",
            "--ffn_chunk", "8192", "--stream_impl", "unroll"]),
    "E10": ("14B int4 720P all streams, stream_impl=unroll",
            ["--task", "t2v-14B", "--size", "1280*720", "--frames", "81",
             "--quant", "int4", "--residual_dtype", "bfloat16",
             "--attn_head_chunk", "8", "--cross_attn_chunk", "16384",
             "--attn_o_chunk", "16384",
             "--ffn_chunk", "16384", "--stream_impl", "unroll"]),
    "E11": ("14B int4 1920x832 all streams, stream_impl=unroll — "
            "the headline config on the workaround impl",
            ["--task", "t2v-14B", "--size", "1920*832", "--frames", "81",
             "--quant", "int4", "--residual_dtype", "bfloat16",
             "--attn_head_chunk", "8", "--cross_attn_chunk", "16384",
             "--attn_o_chunk", "16384",
             "--ffn_chunk", "16384", "--stream_impl", "unroll"]),
    # ---- r4b: the DUS-free streamed form. E12 (acc-o, whole-L cross)
    # compiled 17.27 GB and E13 (acc-o, hc4, chunked cross) 16.02 GB —
    # both over budget; whole-L streamed-o (attn_o_chunk=None) keeps
    # streamed-o's memory collapse with NO dynamic_update_slice in the
    # attention paths (plain per-group adds + whole-L cross).
    "E14": ("14B int4 1920x832, whole-L streamed-o + whole-L cross + "
            "fori ffn_chunk, unroll — DUS-free headline config",
            ["--task", "t2v-14B", "--size", "1920*832", "--frames", "81",
             "--quant", "int4", "--residual_dtype", "bfloat16",
             "--attn_head_chunk", "8",
             "--ffn_chunk", "16384", "--stream_impl", "unroll"]),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", choices=sorted(RUNGS))
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--skip_health_wait", action="store_true")
    args = ap.parse_args()

    if args.list or not args.rung:
        for k in sorted(RUNGS):
            print(f"{k}: {RUNGS[k][0]}")
        return

    desc, probe_args = RUNGS[args.rung]
    print(f"[{args.rung}] {desc}", flush=True)

    if not args.skip_health_wait:
        # a wedged worker can take >1 h to drain (docs/performance.md
        # "Operating the remote worker") — give the health wait 4 h and
        # treat a timeout as a verdict, not a crash of this driver
        try:
            rc = subprocess.run(
                [sys.executable, "tools/tpu_health.py", "--wait"],
                timeout=4 * 3600).returncode
        except subprocess.TimeoutExpired:
            print("health wait timed out after 4 h; aborting", flush=True)
            return 2
        if rc != 0:
            print("health wait failed; aborting", flush=True)
            return 2

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "tools/fwd_probe.py", *probe_args],
        capture_output=True, text=True, timeout=args.timeout)
    dt = time.time() - t0
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-15:])
    crashed = ("crashed or restarted" in tail or "UNAVAILABLE" in tail
               or "kernel fault" in tail)
    verdict = "CRASH" if crashed else (
        "OK" if proc.returncode == 0 else f"rc={proc.returncode}")
    print(f"[{args.rung}] verdict={verdict} in {dt:.0f}s", flush=True)
    print(tail, flush=True)
    return 1 if crashed else proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
