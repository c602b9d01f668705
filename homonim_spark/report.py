"""Text report tables + YAML config merge for the CLI.

Counterparts of the reference's tabulate-based stats tables
(``/root/reference/homonim/utils.py:38-51``, ``compare.py:188-210``) and its
``FuseCommand`` yaml config merge (``/root/reference/homonim/cli.py:88-117``):
a config file fills in parameters the user did not give on the command line;
unknown config keys are an error.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence


def _fmt_cell(v: Any, float_dp: int = 3) -> str:
    if v is None:
        return "-"
    if isinstance(v, float):
        return f"{v:.{float_dp}f}"
    return str(v)


def format_table(records: List[Dict[str, Any]], headers: Sequence[str] | None = None,
                 float_dp: int = 3) -> str:
    """Plain-text stats table in the reference's tabulate format (header row,
    dashed rule, space-separated columns, zero padding; numbers right-aligned,
    text left-aligned)."""
    if not records:
        return ""
    cols = list(headers) if headers else list(records[0].keys())
    cells = [[_fmt_cell(r.get(c), float_dp) for c in cols] for r in records]
    numeric = [all(isinstance(r.get(c), (int, float)) or r.get(c) is None
                   for r in records) for c in cols]
    widths = [max([len(c)] + [len(row[i]) for row in cells])
              for i, c in enumerate(cols)]

    def fmt_row(vals):
        return " ".join(
            v.rjust(w) if num else v.ljust(w)
            for v, w, num in zip(vals, widths, numeric)
        ).rstrip()

    rule = " ".join("-" * w for w in widths)
    return "\n".join([fmt_row(cols), rule] + [fmt_row(row) for row in cells])


def merge_cli_config(args, argv: Sequence[str], config_path: str,
                     parser_dests: Sequence[str]) -> None:
    """Merge a yaml config into parsed args, in place.

    Reference semantics (``cli.py:95-110``): a config value applies only
    when the matching option was NOT given on the command line; a config key
    that is not a known parameter raises.  Keys use either underscores or
    dashes (``kernel-shape`` == ``kernel_shape``)."""
    import yaml

    with open(config_path) as fh:
        conf = yaml.safe_load(fh) or {}
    if not isinstance(conf, dict):
        raise ValueError(f"config file {config_path} must be a mapping")
    given = {a.split("=", 1)[0].lstrip("-").replace("-", "_")
             for a in argv if isinstance(a, str) and a.startswith("--")}
    for key, value in conf.items():
        dest = str(key).replace("-", "_")
        if dest not in parser_dests:
            raise ValueError(f'unknown config file parameter "{key}"')
        if dest in given:
            continue  # command line wins
        setattr(args, dest, value)


def combine_profiles(in_profile: Dict, config_profile: Dict) -> Dict:
    """Nested out-profile merge (reference ``utils.py:273-310``): when the
    configured driver differs, only generic keys survive from the input
    profile; driver-specific nested dicts (``creation_options``) flatten
    into the root."""
    if str(in_profile.get("driver", "")).lower() != \
            str(config_profile.get("driver", in_profile.get("driver", ""))).lower():
        copy_keys = ["driver", "width", "height", "count", "dtype", "crs", "transform"]
        out = {k: in_profile[k] for k in copy_keys if k in in_profile}
    else:
        out = dict(in_profile)

    def nested_update(dst: Dict, other: Dict) -> Dict:
        for k, v in other.items():
            if isinstance(v, dict):
                nested_update(dst, v)
            else:
                dst[k] = v
        return dst

    return nested_update(out, config_profile)
