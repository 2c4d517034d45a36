{% macro price_rank(col) %}
CASE WHEN {{ col }} >= 40 THEN 'high' WHEN {{ col }} >= 20 THEN 'mid' ELSE 'low' END
{% endmacro %}
