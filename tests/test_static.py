"""Static hygiene checks, self-contained (no flake8/mypy on this image).

The reference repo ships .flake8/.style.yapf/.mypy.ini tooling (SURVEY §4);
this test provides the runnable equivalent: every source file must compile,
carry no unused imports, and avoid tabs. AST-based so it needs no external
packages.
"""
import ast
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SOURCES = sorted(
    list((ROOT / 'molgym_tpu').rglob('*.py')) +
    list((ROOT / 'scripts').rglob('*.py')) +
    [ROOT / 'bench.py', ROOT / '__graft_entry__.py'])

# names whose import is a deliberate side-effect or re-export
ALLOWED_UNUSED = {
    '__init__.py': {'*'},
}


def _imported_names(tree):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                yield alias, (alias.asname or alias.name.split('.')[0])
        elif isinstance(node, ast.ImportFrom):
            if node.module == '__future__':
                continue
            for alias in node.names:
                if alias.name == '*':
                    continue
                yield alias, (alias.asname or alias.name)


def _used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


@pytest.mark.parametrize('path', SOURCES, ids=lambda p: str(p.relative_to(ROOT)))
def test_source_hygiene(path):
    text = path.read_text()
    tree = ast.parse(text, filename=str(path))  # syntax check

    assert '\t' not in text, f'{path.name}: tab characters'

    if path.name in ALLOWED_UNUSED:
        return
    used = _used_names(tree)
    # names referenced in docstring doctests or __all__ strings also count
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.update(w for w in node.value.replace('.', ' ').split()
                        if w.isidentifier())
    unused = [name for alias, name in _imported_names(tree)
              if name not in used]
    assert not unused, f'{path.relative_to(ROOT)}: unused imports {unused}'
