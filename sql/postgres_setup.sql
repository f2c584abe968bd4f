-- ============================================================================
-- graft sink schema — Postgres DDL parity with the reference pipeline
-- (re-derived for the graft `events` data model from the behavior of
-- /root/reference/docker/postgres/postgres_setup.sql:7-93; column set =
-- graft.sink.SinkColumns, rules = graft.ops.Validate).
--
-- This is the sink-side second dedup/validation layer (SURVEY.md §2 D5):
-- the PRIMARY KEY enforces idempotent appends under at-least-once delivery,
-- and the CHECK constraints re-assert the engine's validation rules so a
-- bad writer cannot corrupt the serving tables.
-- ============================================================================

-- Main events table: engine-enriched rows (SinkColumns.events order).
-- Table name MUST match the pipeline's write target
-- (graft.streaming.Pipeline.processBatch appends to "ecommerce_events"),
-- otherwise Spark JDBC auto-creates an unconstrained table and the PK /
-- CHECK layer never applies to the real stream.
CREATE TABLE IF NOT EXISTS ecommerce_events (
    event_id        BIGINT PRIMARY KEY,      -- idempotency: replayed batches upsert-or-fail, never duplicate
    ts              TIMESTAMP NOT NULL,
    user_id         BIGINT,                  -- NULL allowed: anonymous view/click/error events
    event_type      VARCHAR(20) NOT NULL
        CHECK (event_type IN ('view', 'click', 'purchase', 'signup', 'error')),
    value           DOUBLE PRECISION NOT NULL CHECK (value >= 0),
    props           TEXT,
    quantity        INT DEFAULT 0,
    total_amount    NUMERIC(22, 6) DEFAULT 0,
    event_year      INT,
    event_month     INT,
    event_day       INT,
    event_hour      INT,
    event_dayofweek INT,
    is_late_arrival BOOLEAN DEFAULT FALSE,
    session_id      VARCHAR(64),

    -- login-required events must carry a user (mirrors Validate.LoginRequiredEvents)
    CONSTRAINT chk_user_required CHECK (
        event_type IN ('view', 'click', 'error') OR user_id IS NOT NULL
    )
);

CREATE INDEX IF NOT EXISTS idx_ecommerce_events_ts          ON ecommerce_events (ts);
CREATE INDEX IF NOT EXISTS idx_ecommerce_events_user_id     ON ecommerce_events (user_id);
CREATE INDEX IF NOT EXISTS idx_ecommerce_events_event_type  ON ecommerce_events (event_type);
CREATE INDEX IF NOT EXISTS idx_ecommerce_events_session_id  ON ecommerce_events (session_id);
CREATE INDEX IF NOT EXISTS idx_ecommerce_events_ts_type     ON ecommerce_events (ts, event_type);
CREATE INDEX IF NOT EXISTS idx_ecommerce_events_user_ts     ON ecommerce_events (user_id, ts);

-- Dead-letter table: rejected rows + the first-match-wins error tag
CREATE TABLE IF NOT EXISTS dead_letter_events (
    id                SERIAL PRIMARY KEY,
    event_id          BIGINT,
    ts                TIMESTAMP,
    user_id           BIGINT,
    event_type        VARCHAR(50),           -- deliberately loose: invalid types land HERE
    value             DOUBLE PRECISION,
    props             TEXT,
    validation_errors TEXT NOT NULL,
    recorded_at       TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
    reprocessed       BOOLEAN DEFAULT FALSE
);

CREATE INDEX IF NOT EXISTS idx_dead_letter_errors   ON dead_letter_events (validation_errors);
CREATE INDEX IF NOT EXISTS idx_dead_letter_recorded ON dead_letter_events (recorded_at);

-- Per-batch quality metrics — columns EXACTLY as the engine appends them
-- (graft.streaming.Pipeline.processBatch metrics DataFrame)
CREATE TABLE IF NOT EXISTS data_quality_metrics (
    id                  SERIAL PRIMARY KEY,
    batch_id            BIGINT NOT NULL,
    total_events        BIGINT NOT NULL,
    valid_events        BIGINT NOT NULL,
    invalid_events      BIGINT NOT NULL,
    validity_rate       DOUBLE PRECISION,
    processing_time_sec DOUBLE PRECISION,
    recorded_at         TIMESTAMP DEFAULT CURRENT_TIMESTAMP
);

CREATE INDEX IF NOT EXISTS idx_quality_recorded ON data_quality_metrics (recorded_at);

-- Serving views: the SQL twins of graft.ops.Analytics (hourlySummary,
-- sessionSummary, categoryPerformance, qualitySummary run in-engine; these
-- let dashboards hit the sink directly with the same definitions).
CREATE OR REPLACE VIEW v_hourly_summary AS
SELECT
    DATE_TRUNC('hour', ts) AS event_hour_ts,
    event_type,
    COUNT(*)               AS event_count,
    COUNT(DISTINCT user_id) AS unique_users,
    SUM(total_amount)      AS total_revenue
FROM ecommerce_events
GROUP BY DATE_TRUNC('hour', ts), event_type;

CREATE OR REPLACE VIEW v_user_sessions AS
SELECT
    user_id,
    session_id,
    COUNT(*) AS total_events,
    COUNT(CASE WHEN event_type = 'view' THEN 1 END)     AS view_count,
    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
    SUM(total_amount) AS session_revenue,
    MIN(ts) AS session_start,
    MAX(ts) AS session_end
FROM ecommerce_events
GROUP BY user_id, session_id;

CREATE OR REPLACE VIEW v_dead_letter_summary AS
SELECT
    validation_errors,
    COUNT(*) AS error_count,
    MIN(recorded_at) AS first_seen,
    MAX(recorded_at) AS last_seen
FROM dead_letter_events
GROUP BY validation_errors;
