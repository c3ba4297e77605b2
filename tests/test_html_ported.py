"""Full port of the reference HTML converter test suite
(/root/reference/src/converter/html.rs:693-1103, 44 tests): markdown
structure, plain-text projection, boilerplate stripping, and
malformed-input behavior."""

from __future__ import annotations

from anytomd_spark.kernels import sniff
from anytomd_spark.kernels.html_conv import convert_html as _convert


def convert_html(html: str) -> dict:
    return _convert(html.encode("utf-8"))


class TestHtmlDispatch:
    def test_html_supported_extensions(self):
        # html.rs: supported_extensions == ["html", "htm"]
        assert sniff.detect_by_extension("html") == "html"
        assert sniff.detect_by_extension("htm") == "html"

    def test_html_can_convert(self):
        assert sniff.detect_by_extension("txt") != "html"
        assert sniff.detect_by_extension("docx") != "html"


class TestHtmlMarkdown:
    def test_html_empty_document(self):
        assert convert_html("")["markdown"] == ""

    def test_html_headings_h1_through_h6(self):
        md = convert_html(
            "<h1>H1</h1><h2>H2</h2><h3>H3</h3><h4>H4</h4><h5>H5</h5>"
            "<h6>H6</h6>"
        )["markdown"]
        for lvl in range(1, 7):
            assert f"{'#' * lvl} H{lvl}" in md

    def test_html_paragraph_basic(self):
        md = convert_html(
            "<p>First paragraph</p><p>Second paragraph</p>"
        )["markdown"]
        assert "First paragraph\n\nSecond paragraph" in md

    def test_html_bold_and_italic(self):
        md = convert_html(
            "<p><strong>bold</strong> and <em>italic</em></p>"
        )["markdown"]
        assert "**bold**" in md and "*italic*" in md

    def test_html_b_and_i_tags(self):
        md = convert_html("<p><b>bold</b> and <i>italic</i></p>")["markdown"]
        assert "**bold**" in md and "*italic*" in md

    def test_html_inline_code(self):
        md = convert_html(
            "<p>Use <code>cargo build</code> to compile.</p>"
        )["markdown"]
        assert "`cargo build`" in md

    def test_html_code_block(self):
        md = convert_html(
            '<pre><code>fn main() {\n    println!("hello");\n}</code></pre>'
        )["markdown"]
        assert "```\n" in md and "fn main()" in md and "println!" in md

    def test_html_link_basic(self):
        md = convert_html(
            '<a href="https://example.com">Example</a>'
        )["markdown"]
        assert "[Example](https://example.com)" in md

    def test_html_link_no_href(self):
        md = convert_html("<a>just text</a>")["markdown"]
        assert "just text" in md and "[" not in md

    def test_html_image_basic(self):
        md = convert_html('<img src="photo.jpg" alt="A photo">')["markdown"]
        assert "![A photo](photo.jpg)" in md

    def test_html_image_no_alt(self):
        md = convert_html('<img src="photo.jpg">')["markdown"]
        assert "![](photo.jpg)" in md

    def test_html_unordered_list(self):
        md = convert_html(
            "<ul><li>Apple</li><li>Banana</li><li>Cherry</li></ul>"
        )["markdown"]
        assert "- Apple" in md and "- Banana" in md and "- Cherry" in md

    def test_html_ordered_list(self):
        md = convert_html(
            "<ol><li>First</li><li>Second</li><li>Third</li></ol>"
        )["markdown"]
        assert "1. First" in md and "2. Second" in md and "3. Third" in md

    def test_html_nested_list(self):
        md = convert_html(
            "<ul><li>Outer<ul><li>Inner A</li><li>Inner B</li></ul></li>"
            "<li>Outer 2</li></ul>"
        )["markdown"]
        assert "- Outer" in md
        assert "  - Inner A" in md and "  - Inner B" in md
        assert "- Outer 2" in md

    def test_html_table_basic(self):
        md = convert_html(
            "<table><thead><tr><th>Name</th><th>Age</th></tr></thead>"
            "<tbody><tr><td>Alice</td><td>30</td></tr>"
            "<tr><td>Bob</td><td>25</td></tr></tbody></table>"
        )["markdown"]
        assert "| Name | Age |" in md and "|---|---|" in md
        assert "| Alice | 30 |" in md and "| Bob | 25 |" in md

    def test_html_table_no_thead(self):
        md = convert_html(
            "<table><tr><td>Name</td><td>Age</td></tr>"
            "<tr><td>Alice</td><td>30</td></tr></table>"
        )["markdown"]
        assert "| Name | Age |" in md and "| Alice | 30 |" in md

    def test_html_table_empty_cells(self):
        md = convert_html(
            "<table><thead><tr><th>A</th><th>B</th><th>C</th></tr></thead>"
            "<tbody><tr><td>1</td><td></td><td>3</td></tr></tbody></table>"
        )["markdown"]
        assert "| 1 |  | 3 |" in md

    def test_html_blockquote(self):
        assert "> Quoted text" in convert_html(
            "<blockquote>Quoted text</blockquote>"
        )["markdown"]

    def test_html_nested_blockquote(self):
        assert "> > Deeply quoted" in convert_html(
            "<blockquote><blockquote>Deeply quoted</blockquote></blockquote>"
        )["markdown"]

    def test_html_horizontal_rule(self):
        md = convert_html("<p>Above</p><hr><p>Below</p>")["markdown"]
        assert "---" in md and "Above" in md and "Below" in md

    def test_html_line_break(self):
        md = convert_html("<p>Line one<br>Line two</p>")["markdown"]
        assert "Line one\nLine two" in md

    def test_html_void_hr_does_not_close_open_p(self):
        # <hr> is both void and a WHATWG p-closer; the void branch wins
        # (no implied </p>), so text after it still flows in the same <p>
        md = convert_html("<p>a<hr>b</p>")["markdown"]
        assert md == "a\n\n---\nb\n"

    def test_html_void_end_tag_ignored(self):
        # a stray </br> must not disturb the open-element stack
        assert convert_html("<p>a</br>b</p>")["markdown"] == "ab\n"

    def test_html_unknown_element_stack_discipline(self):
        # unknown elements keep stack order (their close edge pops
        # nothing extra; content inside still converts normally)
        md = convert_html("<custom><p>x</p></custom><p>y</p>")["markdown"]
        assert md == "x\n\ny\n"

    def test_html_div_closes_open_p(self):
        # non-void p-closer: <div> synthesizes the implied </p>
        md = convert_html("<p>a<div>b</div>c</p>")["markdown"]
        assert md == "a\n\nbc\n"

    def test_html_script_stripped(self):
        md = convert_html(
            "<p>Visible</p><script>alert('xss');</script><p>Also visible</p>"
        )["markdown"]
        assert "Visible" in md and "Also visible" in md
        assert "alert" not in md and "script" not in md

    def test_html_style_stripped(self):
        md = convert_html(
            "<style>body { color: red; }</style><p>Content</p>"
        )["markdown"]
        assert "Content" in md and "color" not in md and "red" not in md

    def test_html_title_from_title_tag(self):
        out = convert_html(
            "<html><head><title>My Page Title</title></head>"
            "<body><p>Content</p></body></html>"
        )
        assert out["title"] == "My Page Title"

    def test_html_title_fallback_h1(self):
        out = convert_html(
            "<html><body><h1>Main Heading</h1><p>Content</p></body></html>"
        )
        assert out["title"] == "Main Heading"

    def test_html_unicode_cjk(self):
        md = convert_html("<p>한국어 中文 日本語</p>")["markdown"]
        assert "한국어" in md and "中文" in md and "日本語" in md

    def test_html_emoji(self):
        md = convert_html("<p>Hello 🌍🚀✨ World</p>")["markdown"]
        assert "🌍" in md and "🚀" in md and "✨" in md

    def test_html_whitespace_collapse(self):
        md = convert_html("<p>  Multiple   spaces   here  </p>")["markdown"]
        assert "  " not in md
        assert "Multiple spaces here" in md

    def test_html_pre_whitespace_preserved(self):
        md = convert_html(
            "<pre>  indented\n    more indented\n</pre>"
        )["markdown"]
        assert "  indented" in md and "    more indented" in md

    def test_html_heading_with_inline_formatting(self):
        md = convert_html("<h2><em>Italic Title</em></h2>")["markdown"]
        assert "## *Italic Title*" in md

    def test_html_checkbox_input(self):
        md = convert_html(
            '<ul><li><input type="checkbox" checked> Done</li>'
            '<li><input type="checkbox"> Not done</li></ul>'
        )["markdown"]
        assert "[x] Done" in md and "[ ] Not done" in md


class TestHtmlPlainText:
    def test_plain_text_no_heading_markers(self):
        pt = convert_html("<h1>Title</h1><h2>Subtitle</h2>")["plain_text"]
        assert "Title" in pt and "Subtitle" in pt
        assert "# " not in pt and "## " not in pt

    def test_plain_text_no_bold_italic_markers(self):
        pt = convert_html(
            "<p><strong>bold</strong> and <em>italic</em></p>"
        )["plain_text"]
        assert "bold" in pt and "italic" in pt
        assert "**" not in pt and "*italic*" not in pt

    def test_plain_text_link_text_only(self):
        pt = convert_html(
            '<a href="https://example.com">Example</a>'
        )["plain_text"]
        assert "Example" in pt
        assert "[Example]" not in pt and "https://example.com" not in pt

    def test_plain_text_image_alt_text_only(self):
        pt = convert_html('<img src="photo.jpg" alt="A photo">')["plain_text"]
        assert "A photo" in pt
        assert "![" not in pt and "photo.jpg" not in pt

    def test_plain_text_no_code_fences(self):
        pt = convert_html("<pre><code>fn main() {}</code></pre>")["plain_text"]
        assert "fn main() {}" in pt and "```" not in pt

    def test_plain_text_no_inline_backtick(self):
        pt = convert_html("<p>Use <code>cargo</code> to build.</p>")["plain_text"]
        assert "cargo" in pt and "`cargo`" not in pt

    def test_plain_text_table_tab_separated(self):
        pt = convert_html(
            "<table><thead><tr><th>Name</th><th>Age</th></tr></thead>"
            "<tbody><tr><td>Alice</td><td>30</td></tr></tbody></table>"
        )["plain_text"]
        assert "Name\tAge" in pt and "Alice\t30" in pt and "|" not in pt

    def test_plain_text_list_no_markers(self):
        pt = convert_html("<ul><li>Apple</li><li>Banana</li></ul>")["plain_text"]
        assert "Apple" in pt and "Banana" in pt and "- " not in pt

    def test_plain_text_no_blockquote_prefix(self):
        pt = convert_html("<blockquote>Quoted text</blockquote>")["plain_text"]
        assert "Quoted text" in pt and "> " not in pt

    def test_plain_text_empty_document(self):
        assert convert_html("")["plain_text"] == ""

    def test_malformed_html_best_effort(self):
        md = convert_html(
            "<p>Unclosed paragraph<p>Another<b>Bold without close"
        )["markdown"]
        assert "Unclosed paragraph" in md
        assert "Another" in md
        assert "Bold without close" in md
