package graft.cli

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.Filings
import graft.model.FilingTypeName

/** Command-line surface mirroring the reference's click CLI
  * (`/root/reference/secedgar/cli.py:1-126`; semantics pinned by
  * `secedgar/tests/test_cli.py`):
  *
  * {{{
  *   graft-edgar --user-agent "Name (email)" filing \
  *     -l aapl -l msft -t FILING_10Q -s 20210101 -e 20211231 -n 10 \
  *     --directory out/
  *   graft-edgar --user-agent "Name (email)" daily -d 20201113 \
  *     --directory out/
  * }}}
  *
  * Error taxonomy matches the reference:
  *   - usage errors (missing required option, non-int count, unknown
  *     token) → [[UsageError]], exit code 2 (click's `SystemExit`);
  *   - unrecognized `FILING_*` enum name → [[FilingTypeError]]
  *     (`exceptions.py:11`, raised by `cli.py:92-95`);
  *   - malformed date (`date_cleanup`, `cli.py:30-40`) or `count < 1`
  *     (`company.py` count validation) → `IllegalArgumentException`
  *     (`ValueError` analog).
  *
  * The argument vector compiles to a [[Filings.FilingsQuery]]; `main`
  * evaluates it against a mirrored archive root and saves with the
  * analytic sink. [[run]] returns the entries DataFrame so tests (and
  * notebook users) get the frame the command would save.
  */
object Cli {

  final class UsageError(msg: String) extends RuntimeException(msg)
  /** `secedgar.exceptions.FilingTypeError` analog. */
  final class FilingTypeError(msg: String) extends IllegalArgumentException(msg)

  sealed trait Command { def userAgent: String; def directory: String }
  final case class FilingCmd(userAgent: String, lookups: Seq[String],
      ftype: String, start: Option[LocalDate], end: Option[LocalDate],
      count: Option[Int], directory: String) extends Command
  final case class DailyCmd(userAgent: String, date: LocalDate,
      directory: String) extends Command

  /** `date_cleanup` (`cli.py:30-40`): strict YYYYMMDD. */
  private[cli] def dateCleanup(s: String): LocalDate =
    try LocalDate.parse(s, DateTimeFormatter.ofPattern("yyyyMMdd"))
    catch { case e: java.time.format.DateTimeParseException =>
      throw new IllegalArgumentException(
        s"time data '$s' does not match format '%Y%m%d'", e)
    }

  /** Parse the full argument vector: global options, then one
    * subcommand (`filing` | `daily`) with its options.
    */
  def parse(args: Seq[String]): Command = {
    var userAgent: Option[String] = None
    var rest = args.toList
    // global group options come before the subcommand (click group)
    var cmd: Option[String] = None
    while (cmd.isEmpty) rest match {
      case ("-u" | "--user-agent") :: v :: t => userAgent = Some(v); rest = t
      case ("filing" | "daily") :: t => cmd = Some(rest.head); rest = t
      case x :: _ => throw new UsageError(s"no such command or option: $x")
      case Nil => throw new UsageError("missing command (filing | daily)")
    }
    val ua = userAgent.getOrElse(
      throw new UsageError("missing required option '--user-agent'"))

    def intArg(v: String, opt: String): Int =
      try v.toInt
      catch { case _: NumberFormatException =>
        throw new UsageError(s"option '$opt': '$v' is not a valid integer")
      }

    cmd.get match {
      case "filing" =>
        var lookups = List.empty[String]
        var ftype: Option[String] = None
        var start: Option[String] = None
        var end: Option[String] = None
        var count: Option[Int] = None
        var dir: Option[String] = None
        while (rest.nonEmpty) rest match {
          case ("-l" | "--lookups") :: v :: t => lookups :+= v; rest = t
          case ("-t" | "--ftype") :: v :: t => ftype = Some(v); rest = t
          case ("-s" | "--start") :: v :: t => start = Some(v); rest = t
          case ("-e" | "--end") :: v :: t => end = Some(v); rest = t
          case ("-n" | "--count") :: v :: t =>
            count = Some(intArg(v, "-n")); rest = t
          case "--directory" :: v :: t => dir = Some(v); rest = t
          case x :: _ =>
            // click rejects stray positionals like `-l aapl msft` (only
            // repeated -l accumulates) — a usage error, not a lookup
            throw new UsageError(s"got unexpected extra argument ($x)")
          case Nil => ()
        }
        if (lookups.isEmpty)
          throw new UsageError("missing required option '--lookups'")
        val ft = ftype.getOrElse(
          throw new UsageError("missing required option '--ftype'"))
        // FilingType[ftype] with KeyError → FilingTypeError (`cli.py:92-95`)
        val ftValue = FilingTypeName.toValue.getOrElse(ft,
          throw new FilingTypeError(s"Filing type $ft is not valid"))
        // count < 1 → ValueError (`company.py` count validation)
        count.filter(_ < 1).foreach { c =>
          throw new IllegalArgumentException(
            s"Count must be positive integer or None. Given $c")
        }
        FilingCmd(ua, lookups, ftValue, start.map(dateCleanup),
          end.map(dateCleanup), count,
          dir.getOrElse(System.getProperty("user.dir")))
      case "daily" =>
        var date: Option[String] = None
        var dir: Option[String] = None
        while (rest.nonEmpty) rest match {
          case ("-d" | "--date") :: v :: t => date = Some(v); rest = t
          case "--directory" :: v :: t => dir = Some(v); rest = t
          case x :: _ => throw new UsageError(s"got unexpected extra argument ($x)")
          case Nil => ()
        }
        val d = date.getOrElse(
          throw new UsageError("missing required option '--date'"))
        DailyCmd(ua, dateCleanup(d),
          dir.getOrElse(System.getProperty("user.dir")))
    }
  }

  /** The query the command compiles to (`cli.py:97-104,118-126`). */
  def toQuery(cmd: Command): Filings.FilingsQuery = cmd match {
    case f: FilingCmd =>
      Filings(cikLookup = f.lookups, filingType = Some(f.ftype),
        startDate = f.start, endDate = f.end, count = f.count)
    case d: DailyCmd =>
      Filings.DailyQuery(d.date, None)
  }

  /** Parse + compile + evaluate: the entries DataFrame the command
    * saves. Tests map argument vectors through this.
    */
  def run(args: Seq[String], spark: SparkSession, root: String): DataFrame =
    toQuery(parse(args)).entries(spark, root)

  /** `secedgar filing ... / daily ...` over a mirrored archive root
    * (env `SPARK_GRAFT_ARCHIVE_ROOT`): evaluate and save with the
    * analytic sink. Usage errors exit 2, value errors exit 1 — click's
    * behavior.
    */
  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("SPARK_GRAFT_ARCHIVE_ROOT",
      System.getProperty("user.dir"))
    try {
      val cmd = parse(args.toIndexedSeq)
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try graft.sink.PatternSink.writeAnalytic(
        toQuery(cmd).entries(spark, root), cmd.directory)
      finally spark.stop()
    } catch {
      case e: UsageError =>
        System.err.println(s"Usage error: ${e.getMessage}"); sys.exit(2)
      case e: IllegalArgumentException =>
        System.err.println(s"Error: ${e.getMessage}"); sys.exit(1)
    }
  }
}
