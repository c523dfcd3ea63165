#!/usr/bin/env python
"""Static documentation site generator (reference parity:
site/build.py — Jinja2 + markdown; ours is dependency-light: the
``markdown`` package when available, a <pre> fallback otherwise).

    python docs/build.py            # renders docs/_site/*.html
"""
from __future__ import annotations

import html
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "_site")

TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8">
<title>{title} — loops-tpu</title>
<style>
body {{ font-family: system-ui, sans-serif; max-width: 46rem;
       margin: 2rem auto; padding: 0 1rem; line-height: 1.55; }}
pre, code {{ background: #f5f5f5; }}
pre {{ padding: .8rem; overflow-x: auto; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #ccc; padding: .3rem .6rem; }}
nav a {{ margin-right: 1rem; }}
</style></head>
<body><nav>{nav}</nav>
{body}
</body></html>
"""


def render(md_text: str) -> str:
    try:
        import markdown

        return markdown.markdown(md_text, extensions=["tables",
                                                      "fenced_code"])
    except Exception:
        return f"<pre>{html.escape(md_text)}</pre>"


def main():
    pages = []
    for root, _, files in os.walk(HERE):
        if "_site" in root:
            continue
        for f in sorted(files):
            if f.endswith(".md"):
                rel = os.path.relpath(os.path.join(root, f), HERE)
                pages.append(rel)
    os.makedirs(OUT, exist_ok=True)
    nav = " ".join(
        f'<a href="{p[:-3].replace(os.sep, "_")}.html">{p[:-3]}</a>'
        for p in pages)
    for p in pages:
        with open(os.path.join(HERE, p)) as f:
            body = render(f.read())
        out_name = p[:-3].replace(os.sep, "_") + ".html"
        with open(os.path.join(OUT, out_name), "w") as f:
            f.write(TEMPLATE.format(title=p[:-3], nav=nav, body=body))
    print(f"rendered {len(pages)} pages -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
