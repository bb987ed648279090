"""Per-BUFFER traffic audit of the two shipped eval programs (verdict r4
next-round item #1: "a per-buffer accounting of WHICH tensors make up the
263 GB/batch" — the aggregate `cost_analysis()['bytes accessed']` can say
a program is memory-bound but not which tensors to attack).

Parses the POST-OPTIMIZATION scheduled HLO (`compiled.as_text()`): after
fusion, every top-level instruction in the entry computation (and in while
bodies, multiplied by the loop trip count) reads its operands from HBM and
writes its result to HBM*. Traffic per instruction = result bytes + sum of
operand bytes; instructions are grouped by their `metadata.op_name` JAX
scope + source location, giving a ranked table of WHO moves the bytes.

(*) Approximations, all conservative for RANKING purposes:
  - logical bytes (dtype x element count), not tiled-layout padded bytes;
  - no credit for operands XLA keeps resident in VMEM across consumers —
    the table is an upper bound per op, like cost_analysis itself;
  - while-loop trip counts come from the largest integer constant in the
    loop condition (exact for lax.map/scan-style counters; heuristic
    elsewhere — the trip source is printed so a wrong guess is visible).

Usage:
  python scripts/buffer_audit.py --dump         # (re)dump HLO on the chip
  python scripts/buffer_audit.py /tmp/hlo_amg.txt /tmp/hlo_fused.txt
"""

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "u8": 1, "s8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
    "c128": 16,
}

# ops that move no HBM bytes of their own in scheduled HLO
FREE_OPS = {
    "parameter", "get-tuple-element", "tuple", "bitcast", "constant",
    "after-all", "iota",  # iota materializes but is generated, not read
    # completion halves of async transfers: the matching *-start already
    # charged the HBM side
    "async-done", "async-update", "copy-done", "slice-done",
    # VMEM-internal reassembly of prefetched weight slices
    "ConcatBitcast",
}

# async transfer initiations: charge the HBM operands (the read side);
# their outputs land in S(1)/S(2) and self-exclude via hbm_only
START_OPS = {"async-start", "copy-start", "slice-start"}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([^{}]*)\})?")


def shape_bytes(type_str: str, hbm_only: bool = True) -> int:
    """Bytes of one HLO type string; tuples sum their elements. With
    hbm_only (default), elements whose layout carries a memory-space
    annotation S(1) (VMEM) or S(2) (SMEM) count zero — the scheduled
    module's memory-space assignment already says they never touch HBM."""
    total = 0
    for dtype, dims, layout in _SHAPE_RE.findall(type_str):
        if dtype not in DTYPE_BYTES:
            continue  # token/opaque
        if hbm_only and layout and re.search(r"S\(\d\)", layout):
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


_INSTR_RE = re.compile(
    r"^\s+(?:ROOT )?(%[\w.\-]+) = ((?:\([^=]*?\)|[\w\[\]{},:()* ]+?)) "
    r"([\w\-]+)\((.*)$"
)
_COMP_RE = re.compile(r"^(ENTRY )?(%[\w.\-]+)\s*(?:\([^)]*\))?.*\{\s*$")
_META_RE = re.compile(
    r'op_name="([^"]*)"(?:.*?source_file="([^"]*)")?(?:.*?source_line=(\d+))?'
)


def parse_module(text: str):
    """-> (computations: {name: [instr]}, entry_name). instr = dict with
    name, type, op, operand_names, attrs (raw tail), meta (op_name, file,
    line)."""
    comps, entry = {}, None
    cur, cur_name = None, None
    for line in text.splitlines():
        if cur is None:
            # computation headers start at column 0; instructions indent
            m = _COMP_RE.match(line) if line[:1] not in (" ", "\t") else None
            if m:
                cur_name = m.group(2)
                comps[cur_name] = cur = []
                if m.group(1):
                    entry = cur_name
            continue
        if line.startswith("}"):
            cur = None
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, type_str, op, tail = m.groups()
        # operands: %refs before the attribute section. Attributes like
        # calls=%fused_computation also match %refs — capture them
        # separately for while/fusion resolution.
        # split tail at the operand-closing paren by paren balance
        depth, i = 1, 0
        while i < len(tail) and depth:
            if tail[i] == "(":
                depth += 1
            elif tail[i] == ")":
                depth -= 1
            i += 1
        operand_str, attrs = tail[:i], tail[i:]
        meta = {}
        mm = _META_RE.search(attrs)
        if mm:
            meta = {"op_name": mm.group(1), "file": mm.group(2),
                    "line": mm.group(3)}
        cur.append({
            "name": name, "type": type_str.strip(), "op": op,
            "operands": re.findall(r"%[\w.\-]+", operand_str),
            "attrs": attrs, "meta": meta,
        })
    return comps, entry


def trip_count_of(comps_text: str, cond_name: str) -> int:
    """Largest integer literal in the condition computation's text."""
    # grab the computation body from raw text
    pat = re.compile(
        re.escape(cond_name) + r"\s*(?:\([^)]*\))?[^\{]*\{(.*?)^\}",
        re.S | re.M,
    )
    m = pat.search(comps_text)
    if not m:
        return 1
    ints = [int(x) for x in re.findall(r"constant\((\d+)\)", m.group(1))]
    return max(ints) if ints else 1


def audit(path: str, top: int = 25):
    text = open(path).read()
    comps, entry = parse_module(text)
    sizes = {}  # (comp, instr name) -> result bytes
    for cname, instrs in comps.items():
        for ins in instrs:
            sizes[(cname, ins["name"])] = shape_bytes(ins["type"])

    # computations executed once (entry) or trip_count times (while bodies
    # and conditions reached from entry; nested whiles multiply)
    mult = {entry: 1}
    frontier = [entry]
    while frontier:
        cname = frontier.pop()
        for ins in comps.get(cname, []):
            if ins["op"] == "while":
                body = re.search(r"body=(%[\w.\-]+)", ins["attrs"])
                cond = re.search(r"condition=(%[\w.\-]+)", ins["attrs"])
                if body:
                    trips = trip_count_of(text, cond.group(1)) if cond else 1
                    for sub in (body.group(1),) + ((cond.group(1),) if cond else ()):
                        mult[sub] = mult.get(cname, 1) * max(trips, 1)
                        frontier.append(sub)
            elif ins["op"] in ("conditional", "call"):
                for ref in re.findall(r"%[\w.\-]+", ins["attrs"]):
                    if ref in comps and ref not in mult:
                        mult[ref] = mult.get(cname, 1)
                        frontier.append(ref)

    groups = defaultdict(lambda: [0, 0, ""])  # key -> [bytes, count, example]
    total = 0
    for cname, m in mult.items():
        instrs = comps.get(cname, [])
        local = {i["name"]: i for i in instrs}
        for ins in instrs:
            if ins["op"] in FREE_OPS:
                continue
            if ins["op"] == "custom-call":
                mt = re.search(r'custom_call_target="([^"]+)"', ins["attrs"])
                if mt and mt.group(1) in FREE_OPS:
                    continue
            # start ops: charge the HBM read side only (their outputs are
            # S(1)/S(2) staging and self-exclude anyway)
            out_b = 0 if ins["op"] in START_OPS else sizes[(cname, ins["name"])]
            in_b = 0
            for opd in ins["operands"]:
                if opd in local:
                    # GTE/bitcast views resolve to their declared type;
                    # S(1)/S(2) operands charge zero (already in VMEM)
                    in_b += sizes[(cname, opd)]
            t = (out_b + in_b) * m
            total += t
            meta = ins["meta"]
            if not meta.get("op_name") and ins["op"] in START_OPS:
                # async transfers carry no metadata of their own (the
                # called computation is a bare slice/copy): attribute via
                # the SOURCE buffer's defining instruction, falling back to
                # the source's type (weight prefetches come from parameters)
                for opd in ins["operands"]:
                    src = local.get(opd)
                    if src is None:
                        continue
                    if src["meta"].get("op_name"):
                        meta = dict(src["meta"])
                        meta["op_name"] += " (prefetch)"
                    else:
                        meta = {"op_name": f"prefetch<{src['type'][:28]}>"}
                    break
            scope = meta.get("op_name") or ins["op"]
            if ins["op"] == "custom-call" and not meta.get("op_name"):
                mt = re.search(r'custom_call_target="([^"]+)"', ins["attrs"])
                scope = mt.group(1) if mt else scope
            # strip jit wrappers; keep the last 3 scope segments
            scope = "/".join(
                s for s in scope.split("/") if not s.startswith("jit(")
            )
            scope = "/".join(scope.split("/")[-3:]) or ins["op"]
            # collapse per-layer indices so 32 encoder blocks aggregate to
            # one row (block_7 -> block_*)
            scope = re.sub(r"\d+", "*", scope)
            src = ""
            if meta.get("file"):
                src = meta["file"].split("/")[-1] + ":" + (meta.get("line") or "?")
            key = (src, scope, ins["op"])
            g = groups[key]
            g[0] += t
            g[1] += m
            g[2] = ins["type"][:46]
    print(f"\n=== {path}  (accounted traffic ~{total/1e9:.1f} GB/dispatch) ===")
    print(f"{'GB':>8} {'x':>6}  {'op':<14} {'source':<26} {'scope':<44} example-type")
    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])
    shown = 0
    for (src, scope, op), (b, n, ex) in rows[:top]:
        shown += b
        print(f"{b/1e9:>8.2f} {n:>6}  {op:<14} {src:<26} {scope:<44} {ex}")
    print(f"top-{top} covers {100*shown/max(total,1):.0f}% of accounted traffic")
    # loop multipliers, so a wrong trip-count guess is visible
    loops = {c: m for c, m in mult.items() if m > 1}
    if loops:
        print("loop multipliers:", {k: v for k, v in sorted(loops.items())})
    return total


def dump():
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/scripts")
    import numpy as np
    import jax
    import jax.numpy as jnp
    import bench

    # --batch N dumps at that batch size with a _bN suffix (the B=4 vs B=8
    # AMG scheduling comparison, verdict r4 item #6)
    B = 4
    suffix = ""
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
        suffix = f"_b{B}"
    H, W = bench.H, bench.W
    models = bench.build_models()
    amg = models.amg
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)), jnp.uint8)
    img1 = jnp.asarray(rng.integers(0, 255, (B, H, W, 3)), jnp.uint8)
    K = jnp.asarray(np.tile(
        np.array([[572.4, 0, 320], [0, 573.6, 240], [0, 0, 1]], np.float32),
        (B, 1, 1)))
    keys = jnp.asarray(np.stack([np.array([0, i], np.uint32) for i in range(B)]))
    from pope_tpu.models.sam.sam import resize_longest_side

    S = models.config.sam.encoder.img_size
    in_h, in_w = resize_longest_side(H, W, S)
    amg_compiled = amg.boxes_program.lower(
        amg.variables, img1, in_h=in_h, in_w=in_w, orig_h=H, orig_w=W
    ).compile()
    open(f"/tmp/hlo_amg{suffix}.txt", "w").write(amg_compiled.as_text())
    boxes_b, valid_b, dropped_b = amg.generate_boxes_batch(img1)
    jax.block_until_ready(boxes_b)
    from pope_tpu.pipeline.runner import get_executor

    executor = get_executor(models, 256)
    run = executor.batched(mesh=None)
    small, matches = run(img0, img1, K, K, boxes_b, valid_b, None, keys,
                         dropped_b, packed=True)
    jax.block_until_ready(small)
    fused_compiled = run.jitted.lower(
        models.dinov2_variables, models.matcher_variables,
        img0, img1, K, K, boxes_b, valid_b, None, keys, dropped_b,
    ).compile()
    open(f"/tmp/hlo_fused{suffix}.txt", "w").write(fused_compiled.as_text())
    print(f"dumped /tmp/hlo_amg{suffix}.txt /tmp/hlo_fused{suffix}.txt")


if __name__ == "__main__":
    if "--dump" in sys.argv:
        dump()
    else:
        paths = [a for a in sys.argv[1:] if not a.startswith("-")] or [
            "/tmp/hlo_amg.txt", "/tmp/hlo_fused.txt"]
        for p in paths:
            audit(p)
