"""Handwritten adversarial pages (FIXTURES.md §C cases 1-20).

Each case: (name, html bytes). Expected extractions are FROZEN in
golden.json (generated once by scripts/freeze_fixtures.py) so any
semantic drift in the extractor fails the regression test — the
fixture-pinning analog of the reference's regression-oriented plugin
philosophy (/root/reference/README.md:8-9).
"""

from __future__ import annotations

_HUGE_BLOCK = ("word " * 200_000).encode()  # ~1 MB single block

CASES: list = [
    ("minimal", b"<html><body><p>Hello world this is the only paragraph on this page and it has plenty of words to count as content.</p></body></html>"),
    ("empty_main", b"<html><body><nav><a href='/'>Home</a></nav><main></main><footer>c</footer></body></html>"),
    ("boilerplate_only", b"<html><body><nav><ul><li><a href='/a'>A</a></li><li><a href='/b'>B</a></li></ul></nav><footer><p>Copyright 2026 <a href='/p'>Privacy</a></p></footer></body></html>"),
    ("malformed_unclosed", b"<html><body><p>First paragraph with enough words to be considered real page content by the classifier rules here<div>Second chunk also has plenty of words to pass the word count threshold for content easily<p>Third"),
    ("stray_end_tags", b"</div></p><html><body><p>Content paragraph with sufficiently many words to exceed the sixteen word threshold used by the classifier rules in this engine.</p></span></body></html>"),
    ("deeply_nested", b"<html><body>" + b"<div>" * 40 + b"<p>Deep paragraph that still has more than sixteen words inside it so that it is classified as content.</p>" + b"</div>" * 40 + b"</body></html>"),
    ("link_farm", b"<html><body><div><a href='/1'>one link</a> <a href='/2'>two link</a> <a href='/3'>three link</a> <a href='/4'>four link</a></div><p>A real content paragraph follows the link farm and it carries definitely more than sixteen words of text.</p></body></html>"),
    ("unicode_zh_emoji", "<html><body><p>中文段落 \U0001f600 emoji nbsp and zero-width​ chars mixed with enough english words to cross the sixteen word threshold for content blocks.</p></body></html>".encode()),
    ("script_style_excluded", b"<html><head><style>p{color:red}</style></head><body><script>var not_content = 'should never appear';</script><p>Visible paragraph content with more than sixteen words so the shallow classifier keeps it in the extracted output text.</p></body></html>"),
    ("huge_single_block", b"<html><body><p>" + _HUGE_BLOCK + b"</p></body></html>"),
    ("table_heavy", b"<html><body><table><tr><th>H1</th><th>H2</th></tr><tr><td>a</td><td>b</td></tr></table><p>Paragraph outside the table containing definitely more than sixteen separate words so that it is treated as page content.</p></body></html>"),
    ("headings_interleaved", b"<html><body><h1>Top Heading</h1><p>First section body text that contains comfortably more than sixteen words to satisfy the content classification rule set.</p><h2>Second Heading</h2><p>Second section body text also containing comfortably more than sixteen words to satisfy the content classification rule set.</p></body></html>"),
    ("comments_after_content", b"<html><body><p>Article body text with enough words to be extracted as the main content of this particular page example.</p><section class='comments'><h4>Comments</h4><div>short one</div><div>me too</div></section></body></html>"),
    ("whitespace_pathological", b"<html><body><pre>\n\t  spaced\t\tout\n\n\twords   in a   pre block padded with many\n\t tabs and newlines to exceed sixteen words total here \n</pre><p>Normal\nparagraph\twith  collapsed   whitespace and certainly more than sixteen words of actual readable text content inside it.</p></body></html>"),
    ("empty_html", b""),
    ("non_utf8_bytes", b"<html><body><p>Latin-1 caf\xe9 bytes \xff\xfe mixed with enough ascii words to pass the sixteen word threshold for content extraction here.</p></body></html>"),
    ("attribute_noise", b"<html><body><p style='color:red;font-size:12px' onclick='javascript:void(0)' data-x='<fake>'>Paragraph whose attributes are noisy but whose body holds more than sixteen words of plain readable content text.</p></body></html>"),
    ("sibling_div_split", b"<html><body><div>First half of the article text lives in this div and it has more than sixteen words inside.</div><div>Second half of the article text lives in this sibling div and it also has more than sixteen words.</div></body></html>"),
    ("nav_longer_than_content", b"<html><body><nav><a href='/a'>very long navigation label one</a> <a href='/b'>very long navigation label two</a> <a href='/c'>very long navigation label three</a> <a href='/d'>very long navigation label four</a></nav><p>Short real content here but it still has just barely more than sixteen words inside of it okay.</p></body></html>"),
    ("html_none_analog", b"<html><body>just bare text directly in body with more than sixteen words so that it is treated as content text</body></html>"),
    # cases 21-25: round-2 additions (VERDICT r1 #7) — deeper structural
    # and encoding abuse beyond what the generator templates produce
    ("nested_tables_100", b"<html><body>" + b"<table><tr><td>" * 100 + b"<p>Innermost cell paragraph that still carries comfortably more than sixteen words so it is classified as page content here.</p>" + b"</td></tr></table>" * 100 + b"</body></html>"),
    ("rtl_bidi_mixed", "<html><body><p>هذه فقرة عربية طويلة بما يكفي لتجاوز حد الكلمات الستة عشر المستخدم في قواعد التصنيف هنا بالتأكيد تماما</p><p>עברית מימין לשמאל עם מספיק מילים כדי לעבור את סף שש עשרה המילים של חוקי הסיווג כאן בהחלט לגמרי</p><p>Mixed ‫RTL embedding‬ and ‏ marks with enough english words to pass the sixteen word content threshold easily here.</p></body></html>".encode()),
    ("content_inside_nav", b"<html><body><nav><p>This long article paragraph is wrongly wrapped inside a nav element yet it contains far more than sixteen words of genuine readable prose content that a user would want extracted.</p></nav><footer><a href='/x'>x</a></footer></body></html>"),
    ("malformed_utf8_truncated", b"<html><body><p>Paragraph containing a truncated multibyte sequence \xe2\x82 and a lone continuation byte \x85 plus enough ascii words to pass the sixteen word threshold for content.</p></body></html>"),
    ("malformed_utf8_overlong", b"<html><body><p>Overlong slash \xc0\xaf and illegal \xf8\x88\x80\x80\x80 five byte form mixed with enough plain ascii words to exceed the sixteen word content threshold here.</p></body></html>"),
    # cases 26-31: round-3 additions (VERDICT r2 #8) — parser traps the
    # earlier cases don't exercise
    ("cdata_section", b"<html><body><p>Real paragraph before the cdata block carrying comfortably more than sixteen words of genuine readable content text here.</p><![CDATA[ <p>this markup-looking payload is character data not elements</p> ]]><p>Second real paragraph after the cdata block also carrying comfortably more than sixteen words of readable content.</p></body></html>"),
    ("attr_value_gt_trap", b"<html><body><div data-note=\"5 > 3 and also x->y\" title='a > b'><p>Paragraph inside a div whose attribute values contain greater-than characters yet the paragraph still holds more than sixteen words of content.</p></div><a href='/q?a>b'>tiny</a></body></html>"),
    ("noscript_interleaved", b"<html><body><p>Leading article paragraph with comfortably more than sixteen words of real readable content for the extractor to keep.</p><noscript><img src='/pixel.gif'><p>Please enable javascript to view this site properly thanks</p></noscript><p>Trailing article paragraph also holding comfortably more than sixteen words of real readable content for the extractor.</p></body></html>"),
    ("main_entirely_tables", b"<html><body><nav><a href='/h'>home</a></nav><main><table><tr><td><p>The entire main element of this page is one big layout table and this first cell paragraph carries more than sixteen words.</p></td></tr><tr><td><p>The second table cell paragraph likewise carries comfortably more than sixteen words of genuine page content for extraction.</p></td></tr></table></main><footer><a href='/p'>privacy</a></footer></body></html>"),
    ("processing_instruction_doctype", b"<?xml version='1.0'?><!DOCTYPE html PUBLIC '-//W3C//DTD XHTML 1.0//EN'><html><body><?php echo 'server side leftover'; ?><p>Paragraph after processing instructions and a legacy doctype holding definitely more than sixteen words of readable page content text.</p></body></html>"),
    ("comment_with_markup", b"<html><body><!-- <p>commented out fake paragraph that must never surface in output</p> --><p>Live paragraph following an html comment that itself contains markup and this live text has more than sixteen words total.</p><!--[if IE]><p>conditional comment content for ancient browsers</p><![endif]--></body></html>"),
    # cases 32-33: round-4 additions (VERDICT r3 #8) — CDATA hidden
    # inside a script element (raw-text parsing, not markup), and
    # nested <template> subtrees (inert DOM browsers never render).
    # The 10 MB single-block size-guard-boundary case lives in
    # tests/test_extractor.py::test_huge_block_at_size_guard_boundary
    # (procedural — a 10 MB golden.json entry would bloat the repo and
    # slow the R25 validation cadence that replays CASES).
    ("cdata_in_script", b"<html><body><p>Real leading paragraph with comfortably more than sixteen words of genuine readable content text for the extractor to keep.</p><script>/*<![CDATA[*/ var fake = '<p>markup-looking payload inside script cdata that must never surface</p>'; /*]]>*/</script><p>Real trailing paragraph also with comfortably more than sixteen words of genuine readable content text for the extractor.</p></body></html>"),
    ("nested_template", b"<html><body><p>Visible article paragraph before any template holding comfortably more than sixteen words of real readable content text.</p><template><p>Outer template paragraph that browsers never render and that also has more than sixteen words inside it total.</p><template><p>Inner nested template paragraph likewise unrendered by browsers with more than sixteen words of text inside it.</p></template></template><p>Visible closing paragraph after the templates holding comfortably more than sixteen words of real readable content text.</p></body></html>"),
]

NAMES = [c[0] for c in CASES]

# Fixtures whose FROZEN expectation encodes KNOWN content loss (the
# extractor currently returns empty/partial text for them). A golden
# drift here most likely means the extractor improved — report as
# "refreeze required", not as a regression (ADVICE r2).
# nested_tables_100 left this set in r3: the layout-table carve-out in
# classify_block now recovers long low-link prose inside tables.
KNOWN_LOSS = frozenset({"content_inside_nav"})
