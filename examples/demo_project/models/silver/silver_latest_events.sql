-- config: materialized=incremental, incremental_strategy=unique_key, unique_key=user_id
-- tags: silver, events
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM {{ source('raw', 'events') }}) WHERE rn = 1
