package graft.config

/** Environment-variable configuration, mirroring the reference's dataclass
  * settings (`/root/reference/config/settings.py:13-231`): Database,
  * Streaming, DataQuality, Retry and Monitoring groups, each with the same
  * defaults, plus `validate()` and a lazily-initialized singleton.
  */
final case class DatabaseConfig(
    host: String = "localhost",
    port: Int = 5432,
    database: String = "ecommerce",
    user: String = "spark_user",
    password: String = "spark_password",
    batchSize: Int = 5000,
    isolationLevel: String = "READ_COMMITTED",
    // non-Postgres JDBC URL/driver (e.g. the embedded-Derby CI smoke);
    // None = the standard postgres URL/driver from host/port/database
    urlOverride: Option[String] = None,
    driverOverride: Option[String] = None) {
  def jdbcUrl: String =
    urlOverride.getOrElse(s"jdbc:postgresql://$host:$port/$database")
  def driverClass: String = driverOverride.getOrElse("org.postgresql.Driver")
  def properties: Map[String, String] = Map(
    "user" -> user,
    "password" -> password,
    "driver" -> driverClass,
    "batchsize" -> batchSize.toString,
    "isolationLevel" -> isolationLevel)
  def validate(): Unit = {
    require(port > 0 && port <= 65535, s"invalid port $port")
    require(batchSize > 0, "batchSize must be positive")
  }
}

final case class StreamingConfig(
    inputPath: String = "/data/input",
    checkpointLocation: String = "/data/checkpoints",
    triggerSeconds: Int = 10,
    maxFilesPerTrigger: Int = 1,
    watermarkDelay: String = "10 minutes") {
  def validate(): Unit = {
    require(triggerSeconds > 0, "triggerSeconds must be positive")
    require(maxFilesPerTrigger > 0, "maxFilesPerTrigger must be positive")
  }
}

final case class DataQualityConfig(
    lateArrivalMinutes: Int = 5,
    maxReasonableValue: Double = 400.0,
    minValidityRate: Double = 95.0,
    nullRateAlertThreshold: Double = 10.0) {
  def validate(): Unit =
    require(minValidityRate >= 0 && minValidityRate <= 100, "minValidityRate in [0,100]")
}

final case class RetryConfig(
    maxRetries: Int = 3,
    initialDelayMs: Long = 1000,
    backoffFactor: Double = 2.0,
    maxDelayMs: Long = 30000) {
  def validate(): Unit = {
    require(maxRetries >= 0, "maxRetries must be >= 0")
    require(backoffFactor >= 1.0, "backoffFactor must be >= 1")
  }
}

final case class MonitoringConfig(
    windowSize: Int = 10,
    maxBatchLatencySec: Double = 10.0,
    errorConcentrationPct: Double = 10.0,
    consecutiveFailureEscalation: Int = 3) {
  def validate(): Unit = require(windowSize > 0, "windowSize must be positive")
}

final case class GraftConfig(
    database: DatabaseConfig,
    streaming: StreamingConfig,
    quality: DataQualityConfig,
    retry: RetryConfig,
    monitoring: MonitoringConfig) {
  def validate(): this.type = {
    database.validate(); streaming.validate(); quality.validate()
    retry.validate(); monitoring.validate()
    this
  }
}

object GraftConfig {
  private def env(k: String, default: String): String = sys.env.getOrElse(k, default)

  /** Build from environment variables (reference names, GRAFT_ prefixed). */
  def fromEnv(): GraftConfig = GraftConfig(
    DatabaseConfig(
      host = env("GRAFT_DB_HOST", "localhost"),
      port = env("GRAFT_DB_PORT", "5432").toInt,
      database = env("GRAFT_DB_NAME", "ecommerce"),
      user = env("GRAFT_DB_USER", "spark_user"),
      password = env("GRAFT_DB_PASSWORD", "spark_password"),
      batchSize = env("GRAFT_DB_BATCH_SIZE", "5000").toInt),
    StreamingConfig(
      inputPath = env("GRAFT_INPUT_PATH", "/data/input"),
      checkpointLocation = env("GRAFT_CHECKPOINT_LOCATION", "/data/checkpoints"),
      triggerSeconds = env("GRAFT_TRIGGER_SECONDS", "10").toInt,
      maxFilesPerTrigger = env("GRAFT_MAX_FILES_PER_TRIGGER", "1").toInt,
      watermarkDelay = env("GRAFT_WATERMARK_DELAY", "10 minutes")),
    DataQualityConfig(
      lateArrivalMinutes = env("GRAFT_LATE_ARRIVAL_MINUTES", "5").toInt,
      maxReasonableValue = env("GRAFT_MAX_REASONABLE_VALUE", "400.0").toDouble),
    RetryConfig(
      maxRetries = env("GRAFT_MAX_RETRIES", "3").toInt,
      initialDelayMs = env("GRAFT_INITIAL_DELAY_MS", "1000").toLong),
    MonitoringConfig())

  @volatile private var singleton: Option[GraftConfig] = None

  /** Reference `get_config()` singleton semantics. */
  def get: GraftConfig = synchronized {
    singleton.getOrElse { val c = fromEnv().validate(); singleton = Some(c); c }
  }

  /** Test hook. */
  def reset(): Unit = synchronized { singleton = None }
}
