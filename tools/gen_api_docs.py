#!/usr/bin/env python
"""Regenerate docs/api.md from the live package (first docstring line
per public symbol). Run from the repo root:

    JAX_PLATFORMS=cpu python tools/gen_api_docs.py
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SECTIONS = [
    ('nd_tpu', 'Top-level exports'),
    ('nd_tpu.core', 'Data model'),
    ('nd_tpu.io', 'File formats'),
    ('nd_tpu.io.lazy', 'Lazy file-backed arrays'),
    ('nd_tpu.crs', 'Coordinate reference systems'),
    ('nd_tpu.warp', 'Projection / warping'),
    ('nd_tpu.filters', 'Filters'),
    ('nd_tpu.change', 'Change detection'),
    ('nd_tpu.classify', 'Classification'),
    ('nd_tpu.tiling', 'Tiling / mosaicking'),
    ('nd_tpu.vector', 'Vector data'),
    ('nd_tpu.visualize', 'Visualization'),
    ('nd_tpu.parallel', 'Mesh parallelism'),
    ('nd_tpu.algorithm', 'Algorithm framework'),
    ('nd_tpu.utils', 'Utilities'),
    ('nd_tpu.accessors', 'xarray-style accessors'),
    ('nd_tpu.testing', 'Test support'),
    ('nd_tpu.tracing', 'Tracing / profiling'),
    ('nd_tpu.models', 'Pipelines / checkpointing'),
    ('nd_tpu.ops', 'Device kernels'),
]


def _doc_line(obj):
    doc = inspect.getdoc(obj) or ''
    return doc.split('\n', 1)[0].strip()


def main():
    import importlib

    import jax
    jax.config.update('jax_platforms', 'cpu')

    out = ['# API reference', '',
           'Public symbols per module (first docstring line).',
           'Regenerate with `python tools/gen_api_docs.py`.', '']
    for modname, title in SECTIONS:
        mod = importlib.import_module(modname)
        names = getattr(mod, '__all__', None)
        if names is None:
            names = [n for n in vars(mod)
                     if not n.startswith('_')
                     and getattr(getattr(mod, n), '__module__', ''
                                 ).startswith('nd_tpu')]
        out.append('## `%s` — %s' % (modname, title))
        out.append('')
        for n in names:
            obj = getattr(mod, n, None)
            if obj is None:
                continue
            kind = 'class' if inspect.isclass(obj) else \
                'function' if callable(obj) else 'value'
            out.append('- **`%s`** (%s): %s' % (n, kind,
                                                _doc_line(obj)))
        out.append('')
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'docs', 'api.md')
    with open(path, 'w') as fh:
        fh.write('\n'.join(out).rstrip() + '\n')
    print('wrote', path)


if __name__ == '__main__':
    main()
