"""Dependency-free lint gate (the reference ships pre-commit formatting
discipline — clang-format/cmake-format, SURVEY.md §4; this is the rebuild's
equivalent gate, runnable in environments without ruff).

Checks, over every tracked .py file:
  - syntax (compile)
  - unused imports (AST; `# noqa` on the import line opts out, as do
    conventional re-export contexts: __init__.py files and names in __all__)
  - tabs in indentation, trailing whitespace, missing final newline
  - lines over 100 characters

CI additionally runs `ruff check` when available (.github/workflows/ci.yml);
this gate is the floor both environments share.

Run:  python tools/lint.py [paths...]   (default: repo .py files)
"""

import ast
import os
import sys

MAX_LINE = 100


def py_files(root):
    skip_dirs = {".git", ".jax_cache", "__pycache__", ".claude"}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in skip_dirs]
        for f in filenames:
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def imported_names(node):
    """(local name, lineno) pairs bound by an import statement."""
    out = []
    if isinstance(node, ast.Import):
        for a in node.names:
            out.append(((a.asname or a.name).split(".")[0], node.lineno))
    elif isinstance(node, ast.ImportFrom) and node.module != "__future__":
        for a in node.names:
            if a.name == "*":
                continue
            out.append((a.asname or a.name, node.lineno))
    return out


def used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass  # the base Name node is walked separately
    return used


def check_file(path):
    errors = []
    with open(path, "rb") as f:
        src = f.read().decode("utf-8")
    lines = src.split("\n")
    if src and not src.endswith("\n"):
        errors.append((len(lines), "missing final newline"))
    for i, line in enumerate(lines, 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            errors.append((i, "trailing whitespace"))
        indent = stripped[: len(stripped) - len(stripped.lstrip())]
        if "\t" in indent:
            errors.append((i, "tab in indentation"))
        if len(stripped) > MAX_LINE:
            errors.append((i, f"line too long ({len(stripped)} > {MAX_LINE})"))
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        errors.append((e.lineno or 0, f"syntax error: {e.msg}"))
        return errors

    if os.path.basename(path) != "__init__.py":
        # unused imports (module scope and function scope both walk here)
        exported = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__":
                        try:
                            exported = set(ast.literal_eval(node.value))
                        except ValueError:
                            pass
        used = used_names(tree)
        for node in ast.walk(tree):
            for name, lineno in imported_names(node):
                if name in used or name in exported or name == "_":
                    continue
                line = lines[lineno - 1] if lineno - 1 < len(lines) else ""
                if "noqa" in line:
                    continue
                errors.append((lineno, f"unused import '{name}'"))
    return errors


def main():
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
    targets = sys.argv[1:] or [os.path.normpath(root)]
    files = []
    for t in targets:
        if os.path.isdir(t):
            files.extend(py_files(t))
        else:
            files.append(t)
    n_err = 0
    for path in sorted(files):
        for lineno, msg in check_file(path):
            print(f"{os.path.relpath(path)}:{lineno}: {msg}")
            n_err += 1
    if n_err:
        print(f"\n{n_err} lint error(s)")
        sys.exit(1)
    print(f"lint OK ({len(files)} files)")


if __name__ == "__main__":
    main()
