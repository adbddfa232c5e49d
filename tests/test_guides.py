"""Execute every python code block in guides/*.md — the guides are the
application layer (the reference ships runnable Livebooks); they must stay
runnable."""

import re
from pathlib import Path

import pytest

# tf<->ss/zpk conversions in the filter-design guide legitimately hit
# near-zero leading numerator coefficients; normalize warns
# BadCoefficients there (scipy parity) — expected, keep the suite clean
pytestmark = pytest.mark.filterwarnings(
    "ignore:Badly conditioned filter coefficients")

GUIDES = sorted((Path(__file__).parent.parent / "guides").glob("*.md"))


@pytest.mark.parametrize("guide", GUIDES, ids=lambda p: p.stem)
def test_guide_code_runs(guide):
    text = guide.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    assert blocks, f"{guide} has no python blocks"
    namespace = {}
    for block in blocks:
        exec(compile(block, str(guide), "exec"), namespace)
