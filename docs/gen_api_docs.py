"""Generate the markdown API reference under docs/api/ from docstrings.

Run from the repo root:  python docs/gen_api_docs.py
"""

import importlib
import inspect
import os

OUT = os.path.join(os.path.dirname(__file__), "api")

MODULES = [
    ("models", "cornac_tpu.models", "Model zoo"),
    ("data", "cornac_tpu.data", "Data layer"),
    ("datasets", "cornac_tpu.datasets", "Benchmark dataset loaders"),
    ("eval-methods", "cornac_tpu.eval_methods", "Evaluation methods"),
    ("metrics", "cornac_tpu.metrics", "Metrics"),
    ("experiment", "cornac_tpu.experiment", "Experiment"),
    ("hyperopt", "cornac_tpu.hyperopt", "Hyperparameter search"),
    ("serving", "cornac_tpu.serving.core", "Model serving (request handlers; Flask app in .app, stdlib server in .standalone)"),
    ("parallel", "cornac_tpu.parallel", "Mesh & sharding"),
    ("ops", "cornac_tpu.ops", "Device ops"),
    ("utils", "cornac_tpu.utils", "Utilities"),
    ("config", "cornac_tpu.config", "Runtime configuration"),
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, first_block_only=False):
    doc = inspect.getdoc(obj) or ""
    if first_block_only:
        doc = doc.split("\n\n")[0]
    return doc.strip()


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    local_only = names is None  # without __all__, skip re-exported imports
    if names is None:
        names = [n for n in dir(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if inspect.isclass(obj) or inspect.isfunction(obj):
            if local_only and getattr(obj, "__module__", "") != mod.__name__:
                continue
            out.append((n, obj))
        elif inspect.ismodule(obj) and obj.__name__.startswith(mod.__name__):
            out.append((n, obj))
    return out


def render_class(name, cls):
    lines = [f"## `{name}{_sig(cls)}`", ""]
    doc = _doc(cls)
    if doc:
        lines += [doc, ""]
    methods = []
    for mname, meth in inspect.getmembers(cls, predicate=inspect.isfunction):
        if mname.startswith("_") or meth.__qualname__.split(".")[0] != cls.__name__:
            continue  # inherited or private
        methods.append((mname, meth))
    if methods:
        lines.append("**Methods**")
        lines.append("")
        for mname, meth in methods:
            summary = _doc(meth, first_block_only=True).replace("\n", " ")
            lines.append(f"- `{mname}{_sig(meth)}`" + (f" — {summary}" if summary else ""))
        lines.append("")
    return "\n".join(lines)


def render_function(name, fn):
    lines = [f"## `{name}{_sig(fn)}`", ""]
    doc = _doc(fn)
    if doc:
        lines += [doc, ""]
    return "\n".join(lines)


def render_submodule(name, mod):
    lines = [f"## module `{mod.__name__}`", ""]
    doc = _doc(mod, first_block_only=True)
    if doc:
        lines += [doc, ""]
    fns = [
        (n, o)
        for n, o in inspect.getmembers(mod, predicate=inspect.isfunction)
        if not n.startswith("_") and o.__module__ == mod.__name__
    ]
    for n, o in fns:
        summary = _doc(o, first_block_only=True).replace("\n", " ")
        lines.append(f"- `{n}{_sig(o)}`" + (f" — {summary}" if summary else ""))
    if fns:
        lines.append("")
    return "\n".join(lines)


def main():
    os.makedirs(OUT, exist_ok=True)
    index = [
        "# API reference",
        "",
        "Generated from docstrings by `docs/gen_api_docs.py`. Docstrings",
        "cite the reference (`cornac`) implementation each class matches",
        "and document deliberate deviations.",
        "",
    ]
    for slug, modname, title in MODULES:
        mod = importlib.import_module(modname)
        parts = [f"# {title} (`{modname}`)", ""]
        top_doc = _doc(mod, first_block_only=True)
        if top_doc:
            parts += [top_doc, ""]
        classes, functions, submods = [], [], []
        for n, obj in _public_members(mod):
            if inspect.isclass(obj):
                classes.append((n, obj))
            elif inspect.isfunction(obj):
                functions.append((n, obj))
            else:
                submods.append((n, obj))
        for n, obj in classes:
            parts.append(render_class(n, obj))
        for n, obj in functions:
            parts.append(render_function(n, obj))
        for n, obj in submods:
            parts.append(render_submodule(n, obj))
        path = os.path.join(OUT, f"{slug}.md")
        with open(path, "w") as f:
            f.write("\n".join(parts).rstrip() + "\n")
        n_items = len(classes) + len(functions) + len(submods)
        index.append(f"- [{title}]({slug}.md) — {n_items} public entries")
        print(f"{slug}.md: {n_items} entries")
    with open(os.path.join(OUT, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")


if __name__ == "__main__":
    main()
