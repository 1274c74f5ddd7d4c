from goose_parser_spark.rules.compiler import (
    CompiledRule,
    CompiledRules,
    RuleCompiler,
)
from goose_parser_spark.rules.evaluator import evaluate_document

__all__ = ["CompiledRule", "CompiledRules", "RuleCompiler", "evaluate_document"]
