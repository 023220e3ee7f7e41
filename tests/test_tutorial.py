"""Execute every ```python block of docs/tutorial.md in order.

The tutorial is the analog of the reference's notebook tutorials
(``/root/reference/tutorials/``, run by its tutorials CI workflow);
executing the blocks keeps the documented examples from rotting.
"""

import os
import re

TUTORIAL = os.path.join(os.path.dirname(__file__), os.pardir, 'docs',
                        'tutorial.md')


def test_tutorial_blocks_run():
    with open(TUTORIAL) as f:
        text = f.read()
    blocks = re.findall(r'```python\n(.*?)```', text, flags=re.S)
    assert len(blocks) >= 8
    ns: dict = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f'tutorial-block-{i}', 'exec'), ns)
        except Exception as e:
            raise AssertionError(
                f"tutorial block {i} failed: {type(e).__name__}: {e}\n"
                f"---\n{block}") from e
