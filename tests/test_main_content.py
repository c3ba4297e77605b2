"""Main-content extraction kernel tests (block segmentation + WSDM'10
link-density / word-count rules). Rule-table cases are hand-derived
from the published decision rules, not from the kernel's own output."""

from anytomd_spark.kernels.main_content import (
    Block,
    classify_blocks,
    extract_main_content,
    html_blocks,
)

ARTICLE_30 = " ".join(f"word{i}" for i in range(30))
ARTICLE_45 = " ".join(f"word{i}" for i in range(45))


class TestSegmentation:
    def test_blocks_and_link_words(self):
        html = (
            '<nav><a href="/">Home</a> <a href="/x">About</a></nav>'
            f"<p>{ARTICLE_30}</p>"
            '<footer>Copyright <a href="/t">Terms</a></footer>'
        )
        blocks = html_blocks(html)
        assert [b.words for b in blocks] == [2, 30, 2]
        assert [b.linked_words for b in blocks] == [2, 0, 1]
        assert blocks[0].link_density == 1.0
        assert blocks[2].link_density == 0.5

    def test_script_style_skipped(self):
        html = (
            "<style>p { color: red }</style>"
            "<script>var boilerplate = 'many words here';</script>"
            f"<p>{ARTICLE_30}</p>"
        )
        blocks = html_blocks(html)
        assert len(blocks) == 1
        assert blocks[0].words == 30

    def test_each_li_is_a_block(self):
        html = "<ul><li>one two</li><li>three</li></ul>"
        assert [b.text for b in html_blocks(html)] == ["one two", "three"]

    def test_nested_anchor_depth(self):
        html = '<p><a href="/"><span>linked words</span></a> free</p>'
        (b,) = html_blocks(html)
        assert (b.words, b.linked_words) == (3, 2)

    def test_whitespace_collapsed(self):
        (b,) = html_blocks("<p>  a\n\n  b\t c  </p>")
        assert b.text == "a b c"

    def test_empty_and_malformed(self):
        assert html_blocks("") == []
        assert extract_main_content(None)["n_blocks"] == 0
        # unterminated tag tail must not raise
        blocks = html_blocks("<p>words here more of them<a href=")
        assert blocks and blocks[0].words >= 4

    def test_text_density_wrapped_lines(self):
        b = Block(text="x" * 200, words=20, linked_words=0)
        assert b.text_density == 20 / 3  # 200 chars -> 3 wrapped lines


class TestRules:
    """Hand-applied NumWordsRules decision table."""

    def _classify(self, specs):
        blocks = [Block(text=" ".join(["w"] * w), words=w, linked_words=l)
                  for w, l in specs]
        return [b.is_content for b in classify_blocks(blocks)]

    def test_high_link_density_always_boilerplate(self):
        # even a long block is boilerplate at ld > 1/3
        assert self._classify([(60, 30)]) == [False]

    def test_after_linky_block_needs_41_words(self):
        # prev ld 1.0 > 0.555: 40 words not enough, 41 enough
        assert self._classify([(3, 3), (40, 0)]) == [False, False]
        assert self._classify([(3, 3), (41, 0)]) == [False, True]

    def test_after_linky_block_long_next_rescues(self):
        # curr short but next has 18 words -> content
        assert self._classify([(3, 3), (10, 0), (18, 0)]) == \
            [False, True, True]

    def test_plain_context_thresholds(self):
        # isolated block: 17 words content, 16 not
        assert self._classify([(17, 0)]) == [True]
        assert self._classify([(16, 0)]) == [False]
        # prev > 4 words rescues a short block
        assert self._classify([(17, 0), (3, 0)]) == [True, True]

    def test_extract_joins_content_blocks(self):
        html = (
            '<nav><a href="/">Home</a> <a href="/x">About</a> '
            '<a href="/y">Contact</a></nav>'
            f"<p>{ARTICLE_45}</p><p>{ARTICLE_30}</p>"
            '<ul><li><a href="/1">Related link one</a></li></ul>'
        )
        out = extract_main_content(html)
        assert out["n_blocks"] == 4
        assert out["n_content_blocks"] == 2
        assert out["content"] == ARTICLE_45 + "\n\n" + ARTICLE_30
        assert out["n_words"] == 3 + 45 + 30 + 3
        assert out["n_content_words"] == 75
        assert out["boilerplate_ratio"] == round(1 - 75 / 81, 6)
