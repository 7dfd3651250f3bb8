package graft.core

/** Error taxonomy mirroring the reference's exception hierarchy
  * (reference `src/polars_incremental/errors.py:1-42`): a common base, one
  * stage-tagged pipeline error per stage, plus domain errors. Originals are
  * chained as `cause`; graft's own errors pass through unwrapped
  * (reference `pipeline.py:318-413`).
  */
class GraftError(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

sealed abstract class PipelineError(val stage: String, message: String, cause: Throwable)
    extends GraftError(s"[$stage] $message", cause)

class PlanningError(message: String, cause: Throwable = null)
    extends PipelineError("plan", message, cause)
class ReaderError(message: String, cause: Throwable = null)
    extends PipelineError("read", message, cause)
class TransformError(message: String, cause: Throwable = null)
    extends PipelineError("transform", message, cause)
class WriterError(message: String, cause: Throwable = null)
    extends PipelineError("write", message, cause)
class CommitError(message: String, cause: Throwable = null)
    extends PipelineError("commit", message, cause)

class UnsupportedFormatError(message: String) extends GraftError(message)
class MissingOptionError(message: String) extends GraftError(message)
class ChangeDataFeedError(message: String) extends GraftError(message)
class SchemaEvolutionError(message: String) extends GraftError(message)
class CheckpointLockError(message: String) extends GraftError(message)
