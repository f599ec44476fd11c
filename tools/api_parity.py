# -*- coding: utf-8 -*-
"""
API-surface parity audit: statically extract the reference package's
public surface (module functions, classes, methods, properties, and the
keyword parameters each accepts) by AST, then verify every item against
the live ``quakemigrate_tpu`` package.

The reference cannot be imported here (it needs ObsPy/pyproj, absent by
design), so its side is pure ``ast``; the repo side is real imports +
``inspect.signature`` so ``**kwargs``-absorbed and deprecation-shimmed
parameters count as accepted.

Output: ``API_PARITY.json`` at the repo root with every missing symbol/
parameter, minus a documented allowlist of intentional differences
(ObsPy/pyproj-typed surface replaced by the native seis/coords stacks).

Reference surface spec: every public module under
/root/reference/quakemigrate (layer map SURVEY.md section 1).
"""

import ast
import importlib
import inspect
import json
import pathlib
import sys

REF_ROOT = pathlib.Path("/root/reference/quakemigrate")
REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent

# reference module (relative, no .py) -> repo module
MODULE_MAP = {
    "__init__": "quakemigrate_tpu",
    "core/__init__": "quakemigrate_tpu.core",
    "core/lib": "quakemigrate_tpu.core",  # bindings live in the package init
    "export/__init__": "quakemigrate_tpu.export",
    "export/to_obspy": "quakemigrate_tpu.export.to_quakeml",
    "export/to_mfast": "quakemigrate_tpu.export.to_mfast",
    "export/to_nlloc": "quakemigrate_tpu.export.to_nlloc",
    "export/to_snuffler": "quakemigrate_tpu.export.to_snuffler",
    "io/__init__": "quakemigrate_tpu.io",
    "io/amplitudes": "quakemigrate_tpu.io.amplitudes",
    "io/availability": "quakemigrate_tpu.io.availability",
    "io/coalescence": "quakemigrate_tpu.io.coalescence",
    "io/core": "quakemigrate_tpu.io.core",
    "io/cut_waveforms": "quakemigrate_tpu.io.cut_waveforms",
    "io/data": "quakemigrate_tpu.io.data",
    "io/event": "quakemigrate_tpu.io.event",
    "io/scanmseed": "quakemigrate_tpu.io.scanmseed",
    "io/triggered_events": "quakemigrate_tpu.io.triggered_events",
    "lut/__init__": "quakemigrate_tpu.lut",
    "lut/create_lut": "quakemigrate_tpu.lut.create",
    "lut/lut": "quakemigrate_tpu.lut.lut",
    "plot/__init__": "quakemigrate_tpu.plot",
    "plot/amplitudes": "quakemigrate_tpu.plot.amplitudes",
    "plot/event": "quakemigrate_tpu.plot.event",
    "plot/phase_picks": "quakemigrate_tpu.plot.phase_picks",
    "plot/trigger": "quakemigrate_tpu.plot.trigger",
    "signal/__init__": "quakemigrate_tpu.signal",
    "signal/local_mag/__init__": "quakemigrate_tpu.signal.local_mag",
    "signal/local_mag/amplitude": "quakemigrate_tpu.signal.local_mag.amplitude",
    "signal/local_mag/local_mag": "quakemigrate_tpu.signal.local_mag.local_mag",
    "signal/local_mag/magnitude": "quakemigrate_tpu.signal.local_mag.magnitude",
    "signal/onsets/__init__": "quakemigrate_tpu.signal.onsets",
    "signal/onsets/base": "quakemigrate_tpu.signal.onsets.base",
    "signal/onsets/stalta": "quakemigrate_tpu.signal.onsets.stalta",
    "signal/pickers/__init__": "quakemigrate_tpu.signal.pickers",
    "signal/pickers/base": "quakemigrate_tpu.signal.pickers.base",
    "signal/pickers/gaussian": "quakemigrate_tpu.signal.pickers.gaussian",
    "signal/scan": "quakemigrate_tpu.signal.scan",
    "signal/trigger": "quakemigrate_tpu.signal.trigger",
    "util": "quakemigrate_tpu.util",
    # core/libnames: ctypes-dll path helper, no repo analogue needed (the
    # repo compiles its C core on import); covered by allowlist below.
    "core/libnames": "quakemigrate_tpu.core",
}

# Intentional differences, each with the reason. Key forms:
#   "module:Symbol"             whole symbol
#   "module:Symbol.member"      method/property
#   "module:callable(param)"    parameter of function/method
ALLOWLIST = {}


def _is_public(name):
    return not name.startswith("_")


def _params_of(fnode):
    """Parameter names a caller could pass by keyword, + has-**kwargs."""
    a = fnode.args
    names = [p.arg for p in a.posonlyargs + a.args + a.kwonlyargs]
    if names and names[0] in ("self", "cls"):
        names = names[1:]
    return names, a.kwarg is not None


def extract_reference_surface():
    """{module_key: {"functions": {...}, "classes": {...}}} via AST."""
    surface = {}
    for path in sorted(REF_ROOT.rglob("*.py")):
        key = str(path.relative_to(REF_ROOT))[:-3]
        tree = ast.parse(path.read_text(encoding="utf-8"))
        funcs, classes = {}, {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if _is_public(node.name):
                    params, _ = _params_of(node)
                    funcs[node.name] = params
            elif isinstance(node, ast.ClassDef) and _is_public(node.name):
                methods, props, init_params = {}, [], []
                for sub in node.body:
                    if not isinstance(
                        sub, (ast.FunctionDef, ast.AsyncFunctionDef)
                    ):
                        continue
                    deco = {
                        d.id if isinstance(d, ast.Name) else getattr(
                            getattr(d, "value", None), "id", None)
                        for d in sub.decorator_list
                        if isinstance(d, (ast.Name, ast.Attribute))
                    }
                    if sub.name == "__init__":
                        init_params, _ = _params_of(sub)
                    elif _is_public(sub.name):
                        if "property" in deco:
                            props.append(sub.name)
                        else:
                            params, _ = _params_of(sub)
                            methods[sub.name] = params
                classes[node.name] = {
                    "init_params": init_params,
                    "methods": methods,
                    "properties": props,
                }
        if funcs or classes:
            surface[key] = {"functions": funcs, "classes": classes}
    return surface


def _accepts(obj, param):
    """
    Does callable obj accept `param`? True when the name is a real
    parameter, when **kwargs absorbs it, or when *args can take it
    positionally (the repo's exception classes format positional args
    into a message template, accepting the reference's arguments by
    position).
    """
    try:
        sig = inspect.signature(obj)
    except (TypeError, ValueError):
        return True  # C-level / builtin: give benefit of the doubt
    ps = sig.parameters
    if param in ps:
        return True
    return any(
        p.kind in (inspect.Parameter.VAR_KEYWORD,
                   inspect.Parameter.VAR_POSITIONAL)
        for p in ps.values()
    )


def _literal(node):
    try:
        return True, ast.literal_eval(node)
    except (ValueError, SyntaxError, TypeError):
        return False, None


def _kwargs_get_defaults(tree, clsname):
    """{param: literal default} from ``kwargs.get("param", default)``
    calls in a class's __init__, plus class-level ``_DEFAULTS`` dicts."""

    out = {}
    for node in tree.body:
        if not (isinstance(node, ast.ClassDef) and node.name == clsname):
            continue
        for sub in node.body:
            # class-level *DEFAULTS = {...} dicts (this package's idiom);
            # entries with non-literal values (module constants) are
            # skipped individually.
            if (isinstance(sub, ast.Assign) and len(sub.targets) == 1
                    and isinstance(sub.targets[0], ast.Name)
                    and sub.targets[0].id.endswith("DEFAULTS")
                    and isinstance(sub.value, ast.Dict)):
                for key, value in zip(sub.value.keys, sub.value.values):
                    k_ok, k = _literal(key)
                    v_ok, v = _literal(value)
                    if k_ok and v_ok:
                        out[k] = v
            if (isinstance(sub, ast.FunctionDef)
                    and sub.name == "__init__"):
                for call in ast.walk(sub):
                    if not (isinstance(call, ast.Call)
                            and isinstance(call.func, ast.Attribute)
                            and call.func.attr == "get"
                            and isinstance(call.func.value, ast.Name)
                            and call.func.value.id == "kwargs"
                            and len(call.args) == 2
                            and isinstance(call.args[0], ast.Constant)):
                        continue
                    ok, val = _literal(call.args[1])
                    if ok:
                        out[call.args[0].value] = val
    return out


# Known-divergent defaults, each with the reason. All four are the
# None-sentinel idiom for mutable defaults: the signature shows None and
# the body resolves it to the reference's value, so an omitted argument
# behaves identically (the reference puts the mutable literal in the
# signature, a shared-state pitfall this package deliberately avoids).
DEFAULTS_ALLOWLIST = {
    "read_nlloc(phases)": "None -> ['P', 'S'] in body (lut/create.py)",
    "compute_traveltimes(phases)":
        "None -> ['P', 'S'] in body (lut/create.py:73)",
    "Amplitude.__init__(amplitude_params)":
        "None -> {} in body (local_mag/amplitude.py:81)",
    "Magnitude.__init__(magnitude_params)":
        "None -> {} in body (local_mag/magnitude.py:78)",
}


def _signature_defaults(fnode):
    """{param: literal default} from a def node's signature."""

    a = fnode.args
    out = {}
    pos = a.posonlyargs + a.args
    for param, default in zip(pos[len(pos) - len(a.defaults):], a.defaults):
        ok, val = _literal(default)
        if ok:
            out[param.arg] = val
    for param, default in zip(a.kwonlyargs, a.kw_defaults):
        if default is None:
            continue
        ok, val = _literal(default)
        if ok:
            out[param.arg] = val
    return out


def _repo_signature_defaults(obj):
    try:
        sig = inspect.signature(obj)
    except (TypeError, ValueError):
        return {}
    return {
        name: p.default for name, p in sig.parameters.items()
        if p.default is not inspect.Parameter.empty
    }


def compare_defaults():
    """
    Cross-check the literal defaults of every mapped symbol — both the
    ``kwargs.get("name", default)`` idiom (classes) and plain signature
    defaults (functions and methods): a reference user omitting an
    argument must get the reference's behaviour.
    Returns a list of {where, param, reference, repo} mismatches.
    """

    sys.path.insert(0, str(REPO_ROOT))
    mismatches = []
    checked = 0

    def check(where, param, ref_val, repo_val):
        nonlocal checked
        checked += 1
        if repo_val != ref_val and (
            f"{where}({param})" not in DEFAULTS_ALLOWLIST
        ):
            mismatches.append({
                "where": where, "param": param,
                "reference": repr(ref_val), "repo": repr(repo_val),
            })

    for mod_key, target in MODULE_MAP.items():
        ref_path = REF_ROOT / f"{mod_key}.py"
        if not ref_path.is_file():
            continue
        ref_tree = ast.parse(ref_path.read_text(encoding="utf-8"))
        repo_mod = importlib.import_module(target)
        repo_file = getattr(repo_mod, "__file__", None)
        if repo_file is None:
            continue
        repo_tree = ast.parse(
            pathlib.Path(repo_file).read_text(encoding="utf-8")
        )
        for node in ref_tree.body:
            # Module-level functions: signature defaults
            if (isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
                    and _is_public(node.name)):
                obj = getattr(repo_mod, node.name, None)
                if obj is None:
                    continue
                repo_defaults = _repo_signature_defaults(obj)
                for param, ref_val in _signature_defaults(node).items():
                    if param in repo_defaults:
                        check(node.name, param, ref_val,
                              repo_defaults[param])
            if not (isinstance(node, ast.ClassDef)
                    and _is_public(node.name)):
                continue
            cls = getattr(repo_mod, node.name, None)
            # kwargs.get defaults
            ref_defaults = _kwargs_get_defaults(ref_tree, node.name)
            repo_defaults = _kwargs_get_defaults(repo_tree, node.name)
            for param, ref_val in ref_defaults.items():
                if param in repo_defaults:
                    check(node.name, param, ref_val, repo_defaults[param])
            # Method signature defaults
            if cls is None:
                continue
            for sub in node.body:
                if not (isinstance(sub, (ast.FunctionDef,
                                         ast.AsyncFunctionDef))
                        and (_is_public(sub.name)
                             or sub.name == "__init__")):
                    continue
                meth = (cls if sub.name == "__init__"
                        else getattr(cls, sub.name, None))
                if meth is None:
                    continue
                repo_meth_defaults = _repo_signature_defaults(meth)
                for param, ref_val in _signature_defaults(sub).items():
                    if param in repo_meth_defaults:
                        check(f"{node.name}.{sub.name}", param, ref_val,
                              repo_meth_defaults[param])
    return checked, mismatches


def audit():
    sys.path.insert(0, str(REPO_ROOT))
    ref = extract_reference_surface()
    missing = []  # list of {kind, where, detail}

    def allowed(*keys):
        return any(k in ALLOWLIST for k in keys)

    for mod_key, spec in ref.items():
        target = MODULE_MAP.get(mod_key)
        if target is None:
            missing.append({"kind": "module", "where": mod_key,
                            "detail": "no repo module mapping"})
            continue
        repo_mod = importlib.import_module(target)

        for fname, params in spec["functions"].items():
            fq = f"{mod_key}:{fname}"
            obj = getattr(repo_mod, fname, None)
            if obj is None:
                if not allowed(fq):
                    missing.append({"kind": "function", "where": fq,
                                    "detail": "symbol absent"})
                continue
            for p in params:
                if not _accepts(obj, p) and not allowed(
                    fq, f"{mod_key}:{fname}({p})"
                ):
                    missing.append({"kind": "param",
                                    "where": f"{fq}({p})",
                                    "detail": "parameter not accepted"})

        for cname, cspec in spec["classes"].items():
            fq = f"{mod_key}:{cname}"
            cls = getattr(repo_mod, cname, None)
            if cls is None:
                if not allowed(fq):
                    missing.append({"kind": "class", "where": fq,
                                    "detail": "symbol absent"})
                continue
            for p in cspec["init_params"]:
                if not _accepts(cls, p) and not allowed(
                    fq, f"{mod_key}:{cname}({p})"
                ):
                    missing.append({"kind": "param",
                                    "where": f"{fq}({p})",
                                    "detail": "__init__ parameter not "
                                              "accepted"})
            for mname, mparams in cspec["methods"].items():
                mfq = f"{fq}.{mname}"
                meth = getattr(cls, mname, None)
                if meth is None:
                    if not allowed(mfq):
                        missing.append({"kind": "method", "where": mfq,
                                        "detail": "method absent"})
                    continue
                if isinstance(
                    inspect.getattr_static(cls, mname, None), property
                ):
                    continue  # repo models it as a property: accessible
                for p in mparams:
                    if not _accepts(meth, p) and not allowed(
                        mfq, f"{mfq}({p})"
                    ):
                        missing.append({"kind": "param",
                                        "where": f"{mfq}({p})",
                                        "detail": "parameter not accepted"})
            for pname in cspec["properties"]:
                pfq = f"{fq}.{pname}"
                if not hasattr(cls, pname) and not allowed(pfq):
                    missing.append({"kind": "property", "where": pfq,
                                    "detail": "property absent"})

    counts = {}
    for m in missing:
        counts[m["kind"]] = counts.get(m["kind"], 0) + 1
    n_items = sum(
        len(s["functions"])
        + sum(len(c["init_params"]) + len(c["methods"])
              + len(c["properties"]) + 1 for c in s["classes"].values())
        + sum(len(p) for p in s["functions"].values())
        for s in ref.values()
    )
    defaults_checked, default_mismatches = compare_defaults()
    return {
        "reference_items_checked": n_items,
        "allowlisted": len(ALLOWLIST),
        "missing_count": len(missing),
        "missing_by_kind": counts,
        "missing": missing,
        "defaults_checked": defaults_checked,
        "defaults_allowlisted": len(DEFAULTS_ALLOWLIST),
        "default_mismatch_count": len(default_mismatches),
        "default_mismatches": default_mismatches,
    }


def main():
    report = audit()
    out = REPO_ROOT / "API_PARITY.json"
    out.write_text(json.dumps(report, indent=1))
    print(f"checked {report['reference_items_checked']} reference API items; "
          f"missing {report['missing_count']} "
          f"({report['missing_by_kind']}); "
          f"{report['defaults_checked']} shared kwargs defaults, "
          f"{report['default_mismatch_count']} mismatched -> {out.name}")
    return 0 if (report["missing_count"] == 0
                 and report["default_mismatch_count"] == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
