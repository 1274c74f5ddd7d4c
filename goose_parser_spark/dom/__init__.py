from goose_parser_spark.dom.parser import Element, parse_html
from goose_parser_spark.dom.selector import Selector, select

__all__ = ["Element", "parse_html", "Selector", "select"]
