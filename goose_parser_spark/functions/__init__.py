from goose_parser_spark.functions.transforms import (
    TransformRegistry,
    default_registry,
    js_trim,
)

__all__ = ["TransformRegistry", "default_registry", "js_trim"]
