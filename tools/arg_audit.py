"""Argument-parity audit: diff reference DALI_SCHEMA argument lists vs ours.

Scans the reference tree's C++ ``DALI_SCHEMA(Name)`` blocks for
``AddArg``/``AddOptionalArg``/``AddOptionalTypeArg`` registrations (plus the
implicit args of ``AddRandomSeedArg`` and parent schemas via ``AddParent``),
then compares each op's argument set against dali_tpu's registry.

Usage: python tools/arg_audit.py [--all] [op-name-filter]
  default: print ops with missing args, sorted by missing count
  --all:   include ops where we have every reference arg
"""

import os
import re
import sys
import glob
from collections import defaultdict

REF = "/root/reference/dali"

SCHEMA_RE = re.compile(r"DALI_SCHEMA\(\s*([A-Za-z0-9_:]+)\s*\)")
ARG_RE = re.compile(
    r'\.\s*Add(?:Optional)?(?:Type)?Arg(?:<[^>]*>)?\s*\(\s*"([A-Za-z0-9_]+)"')
PARENT_RE = re.compile(r'\.\s*AddParent\s*\(\s*"([A-Za-z0-9_:]+)"\s*\)')
DEPRECATE_RE = re.compile(r'\.\s*DeprecateArg(?:InFavorOf)?\s*\(\s*"([A-Za-z0-9_]+)"')
INTERNAL_RE = re.compile(r"\.\s*MakeInternal\s*\(\s*\)")


def parse_reference():
    """Return {schema_name: (args:set, parents:list, deprecated:set, internal:bool)}."""
    schemas = {}
    files = []
    for ext in ("cc", "cu", "h", "cpp"):
        files += glob.glob(os.path.join(REF, "**", f"*.{ext}"), recursive=True)
    for path in files:
        try:
            with open(path, errors="replace") as f:
                text = f.read()
        except OSError:
            continue
        for m in SCHEMA_RE.finditer(text):
            name = m.group(1)
            # schema block ends at the next ';' at paren-depth 0
            i = m.end()
            depth = 0
            while i < len(text):
                c = text[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == ";" and depth <= 0:
                    break
                i += 1
            block = text[m.start():i]
            args = set(ARG_RE.findall(block))
            parents = PARENT_RE.findall(block)
            deprecated = set(DEPRECATE_RE.findall(block))
            internal = bool(INTERNAL_RE.search(block))
            if name in schemas:
                a, p, d, it = schemas[name]
                schemas[name] = (a | args, p + parents, d | deprecated,
                                 it or internal)
            else:
                schemas[name] = (args, parents, deprecated, internal)
    return schemas


def resolve(schemas, name, _seen=None):
    """Flatten parent args into the schema's own set."""
    if _seen is None:
        _seen = set()
    if name in _seen or name not in schemas:
        return set(), set()
    _seen.add(name)
    args, parents, deprecated, _ = schemas[name]
    args = set(args)
    deprecated = set(deprecated)
    for p in parents:
        pa, pd = resolve(schemas, p, _seen)
        args |= pa
        deprecated |= pd
    return args, deprecated

# args every DALI op has via OpSpec/base schema, or that are meaningless here
GLOBAL_IGNORE = {
    "seed", "device", "bytes_per_sample_hint", "preserve", "max_batch_size",
    "num_threads", "inplace", "default_cuda_stream_priority", "preserve_name",
    # CUDA/GDS/NVDEC-specific knobs with no TPU-host analogue
    "hw_decoder_load", "preallocate_width_hint", "preallocate_height_hint",
    "device_memory_padding", "host_memory_padding", "hybrid_huffman_threshold",
    "split_stages", "use_chunk_allocator", "use_fast_idct", "affine",
    "gpu_memory_stats", "blocking", "no_copy", "logical_id",
    "num_devices", "additional_decode_surfaces", "use_o_direct",
    "o_direct_alignm", "o_direct_chunk_size", "o_direct_read_len_alignm",
    "dont_use_mmap", "enable_memory_stats", "prefetch_queue_depth",
    "cache_debug", "cache_batch_copy",
    # internal plumbing args of the reference python layer
    "_scope", "function_id",
}


def main():
    show_all = "--all" in sys.argv
    filters = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dali_tpu import _schema  # noqa: E402

    ref = parse_reference()
    rows = []
    for name, schema in sorted(_schema._registry.items()):
        ref_name = name.replace(".", "__")
        if ref_name not in ref:
            alt = name.split(".")[-1]
            ref_name = alt if alt in ref else None
        if ref_name is None:
            continue
        ref_args, ref_deprecated = resolve(ref, ref_name)
        ours = set(schema.args.keys())
        missing = ref_args - ours - GLOBAL_IGNORE - ref_deprecated
        extra_dep = (ref_deprecated & ref_args) - ours
        if filters and not any(f.lower() in name.lower() for f in filters):
            continue
        if missing or show_all:
            rows.append((len(missing), name, sorted(missing), sorted(extra_dep)))
    rows.sort(reverse=True)
    total = 0
    for n, name, missing, dep in rows:
        total += n
        line = f"{name:45s} missing({n}): {', '.join(missing)}"
        if dep:
            line += f"   [deprecated-only: {', '.join(dep)}]"
        print(line)
    print(f"\n{len(rows)} ops with gaps, {total} missing args total")


if __name__ == "__main__":
    main()
