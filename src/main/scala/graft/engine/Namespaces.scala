package graft.engine

/**
 * Namespace control-plane state machine (reference:
 * usecases/namespaces/controller.go + require_active.go + public_message.go,
 * entities/schema/validation.go:125-150). Namespaces group collections for
 * platform suspension/teardown; the data plane consults [[requireActive]]
 * before serving a namespaced collection.
 *
 * The reference replicates this map through RAFT; here the same state
 * machine is driver-local (Spark's control plane is the driver) with the
 * RAFT log index kept as the caller-supplied `appliedIndex`, preserving the
 * reference's optimistic-concurrency contract (StateChangeIndex CAS,
 * controller.go:246-280) so a re-proposed command cannot undo a later flip.
 *
 * All outcomes are Either[NsError, _] — the sentinel set mirrors the
 * reference's errors.Is-comparable sentinels, and [[Namespaces.publicMessage]]
 * maps them to the user-facing texts callers outside the management API must
 * render (public_message.go: never the namespace name, never the concept).
 */
object Namespaces {

  sealed abstract class State(val name: String)
  object State {
    case object Active    extends State("ACTIVE")
    case object Suspended extends State("SUSPENDED")
    case object Resuming  extends State("RESUMING")
    case object Deleting  extends State("DELETING")
    val all: Seq[State] = Seq(Active, Suspended, Resuming, Deleting)
    def parse(s: String): Option[State] = all.find(_.name == s.toUpperCase(java.util.Locale.ROOT))
  }

  /** controller.go stateTransitions — deleting is terminal; every other
   * state may reach deleting so a namespace whose home node died mid-flip
   * can still be deleted. */
  private val transitions: Map[State, Set[State]] = Map(
    State.Active    -> Set(State.Suspended, State.Deleting),
    State.Suspended -> Set(State.Resuming, State.Active, State.Deleting),
    State.Resuming  -> Set(State.Active, State.Suspended, State.Deleting),
    State.Deleting  -> Set.empty)

  sealed abstract class NsError(val message: String)
  case object BadRequest extends NsError("bad request")
  case object AlreadyExists extends NsError("namespace already exists")
  case object NotFound extends NsError("namespace not found")
  case object NamespaceDeleting extends NsError("namespace is being deleted")
  case object NamespaceGone extends NsError("namespace no longer exists")
  case object InvalidState extends NsError("namespace is in an invalid state for this operation")
  case object InvalidStateTransition extends NsError("invalid namespace state transition")
  case object NamespaceSuspended extends NsError("namespace is suspended")
  case object NamespaceResuming extends NsError("namespace is resuming")
  case object StateChangedConcurrently extends NsError("namespace state changed concurrently")

  /** public_message.go — the user-facing text for a lifecycle sentinel;
   * None for errors that are not lifecycle sentinels (callers keep the
   * detail of a genuine internal failure). */
  def publicMessage(e: NsError): Option[String] = e match {
    case NamespaceSuspended => Some("instance suspended")
    case NamespaceResuming  => Some("instance resuming, retry shortly")
    case NamespaceGone | NamespaceDeleting | InvalidState |
         InvalidStateTransition | NotFound => Some("instance unavailable")
    case _ => None
  }

  /** controller.go reservedNames — refused at Create time. */
  val reservedNames: Set[String] =
    Set("admin", "system", "default", "internal", "weaviate", "global", "public")

  /** entities/schema NamespaceSeparator — qualified entity names are
   * "<namespace>:<entity>" (usecases/schema/namespacing/resolver.go). */
  val Separator = ":"

  /** resolver.go QualifiedName: join, or the bare name when ns is empty. */
  def qualifiedName(namespace: String, name: String): String =
    if (namespace.isEmpty) name else namespace + Separator + name

  /** resolver.go NamespaceFromQualified: the prefix, "" when unqualified. */
  def namespaceFromQualified(name: String): String = {
    val i = name.indexOf(Separator)
    if (i >= 0) name.substring(0, i) else ""
  }

  /** resolver.go StripQualification: the entity after the FIRST separator —
   * the short, namespace-portable form written into beacons/exports. */
  def stripQualification(name: String): String = {
    val i = name.indexOf(Separator)
    if (i >= 0) name.substring(i + Separator.length) else name
  }

  private val nameRegex = "^[a-z0-9][a-z0-9-]*[a-z0-9]$".r

  /** entities/schema/validation.go ValidateNamespaceNameSyntax (length 3-36,
   * lowercase letters/digits/hyphens, letter/digit edges) + controller.go
   * ValidateName (reserved names). */
  def validateName(name: String): Either[NsError, Unit] =
    if (name.length < 3 || name.length > 36) Left(BadRequest)
    // full-string match (matches()), not findFirstIn — Java's $ would accept
    // a trailing line terminator, letting "default\n" bypass both the syntax
    // rule and the reserved-name refusal
    else if (!nameRegex.pattern.matcher(name).matches()) Left(BadRequest)
    else if (reservedNames.contains(name)) Left(BadRequest)
    else Right(())

  final case class Namespace(name: String, homeNode: String,
                             state: State, stateChangeIndex: Long)
}

final class Namespaces {
  import Namespaces._

  private val namespaces = scala.collection.mutable.Map.empty[String, Namespace]

  /** controller.go Create: inserts ACTIVE, records `index` (the apply's log
   * index — 0 would read back as "unknown precondition") as the
   * StateChangeIndex; the caller cannot choose State or index. */
  def create(name: String, homeNode: String, index: Long): Either[NsError, Unit] =
    synchronized {
      if (index == 0L) Left(BadRequest)
      else validateName(name).flatMap { _ =>
        if (homeNode == null || homeNode.isEmpty) Left(BadRequest)
        else namespaces.get(name) match {
          case Some(ns) if ns.state == State.Deleting => Left(NamespaceDeleting)
          case Some(_) => Left(AlreadyExists)
          case None =>
            namespaces += name -> Namespace(name, homeNode, State.Active, index)
            Right(())
        }
      }
    }

  /** controller.go Update: overwrites HomeNodes only; Name/State/index are
   * immutable here. */
  def update(name: String, homeNode: String): Either[NsError, Unit] = synchronized {
    if (homeNode == null || homeNode.isEmpty) Left(BadRequest)
    else namespaces.get(name) match {
      case None => Left(NotFound)
      case Some(ns) if ns.state == State.Deleting => Left(NamespaceDeleting)
      case Some(ns) =>
        namespaces += name -> ns.copy(homeNode = homeNode); Right(())
    }
  }

  /** controller.go ChangeState: same-state flips are idempotent no-ops
   * (checked BEFORE the CAS, so re-applying a committed command still
   * succeeds); a nonzero `expectedIndex` makes the flip conditional on the
   * stored StateChangeIndex (optimistic concurrency); the transition table
   * gates the rest. */
  def changeState(name: String, target: State,
                  appliedIndex: Long, expectedIndex: Long = 0L): Either[NsError, Unit] =
    synchronized {
      if (appliedIndex == 0L) Left(BadRequest)
      else namespaces.get(name) match {
        case None => Left(NotFound)
        case Some(ns) if ns.state == target => Right(())
        case Some(ns) if expectedIndex != 0L && ns.stateChangeIndex != expectedIndex =>
          Left(StateChangedConcurrently)
        case Some(ns) if !transitions(ns.state).contains(target) =>
          Left(InvalidStateTransition)
        case Some(ns) =>
          namespaces += name -> ns.copy(state = target, stateChangeIndex = appliedIndex)
          Right(())
      }
    }

  /** controller.go RemoveEntity: only a namespace already marked deleting
   * may leave the map (re-entry is a fresh Create). */
  def removeEntity(name: String): Either[NsError, Unit] = synchronized {
    namespaces.get(name) match {
      case None => Left(NotFound)
      case Some(ns) if ns.state != State.Deleting => Left(InvalidState)
      case Some(_) => namespaces -= name; Right(())
    }
  }

  def get(name: String): Option[Namespace] = synchronized(namespaces.get(name))

  /** Name-sorted snapshot (the reference's Get iterates an unordered map;
   * pinned here for reproducibility). */
  def list(): Seq[Namespace] = synchronized(namespaces.values.toSeq.sortBy(_.name))

  def count: Int = synchronized(namespaces.size)

  /** controller.go ListDeleting — lexicographically sorted. */
  def listDeleting(): Seq[String] =
    synchronized(namespaces.values.filter(_.state == State.Deleting).map(_.name).toSeq.sorted)

  /** controller.go Snapshot/Restore: entries with empty state normalize to
   * ACTIVE; unknown states and missing home nodes are rejected (no silent
   * mis-classification of a future binary's snapshot). */
  def snapshot(): Seq[(String, String, String, Long)] = synchronized {
    namespaces.values.toSeq.sortBy(_.name)
      .map(ns => (ns.name, ns.homeNode, ns.state.name, ns.stateChangeIndex))
  }

  def restore(entries: Seq[(String, String, String, Long)]): Either[NsError, Unit] =
    synchronized {
      val parsed = entries.foldLeft[Either[NsError, List[Namespace]]](Right(Nil)) {
        case (Left(e), _) => Left(e)
        case (Right(acc), (name, home, stateName, idx)) =>
          if (home == null || home.isEmpty) Left(BadRequest)
          else {
            val st =
              if (stateName == null || stateName.isEmpty) Some(State.Active)
              else State.parse(stateName)
            st.toRight(BadRequest: NsError).map(s => Namespace(name, home, s, idx) :: acc)
          }
      }
      parsed.map { list =>
        // the fold prepends, so `list` is in reverse entry order — restore in
        // ORIGINAL order so a later duplicate entry wins (last-write-wins,
        // what a snapshot-stream consumer expects)
        namespaces.clear(); namespaces ++= list.reverse.map(ns => ns.name -> ns); ()
      }
    }

  /** require_active.go RequireActive: empty name = entity outside any
   * namespace; a missing namespace is GONE (the caller validated it
   * earlier), and each non-active state maps to its own sentinel. */
  def requireActive(name: String): Either[NsError, Unit] = synchronized {
    if (name.isEmpty) Right(())
    else namespaces.get(name) match {
      case None => Left(NamespaceGone)
      case Some(ns) => ns.state match {
        case State.Active    => Right(())
        case State.Suspended => Left(NamespaceSuspended)
        case State.Resuming  => Left(NamespaceResuming)
        case State.Deleting  => Left(NamespaceDeleting)
      }
    }
  }
}
