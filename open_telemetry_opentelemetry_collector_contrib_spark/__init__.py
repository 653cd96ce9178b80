"""otelcol-spark: a PySpark-native log/telemetry analytics pipeline.

A from-scratch reimplementation of the OpenTelemetry Collector contrib
processor/connector pipeline semantics (reference: opentelemetry-collector-contrib
v0.115.0) expressed as Spark DataFrame programs:

    parse (stanza/OTTL converters)  -> enrich (attributes/resource processors,
    broadcast-join lookups)         -> route (routingconnector)
                                    -> aggregate (count/sum connectors)
                                    -> sinks (fileexporter -> parquet/Iceberg tables)

Everything is declarative DataFrame/Catalyst; pandas UDFs appear only where
built-in functions genuinely cannot express the semantics (grok named-capture
parsing, user-agent decomposition).
"""

__version__ = "0.1.0"
